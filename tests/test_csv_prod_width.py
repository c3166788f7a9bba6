"""metrics.csv at production width: 1000 ROI columns stay O(row) to write."""

import time

import pandas as pd

from phantom_vlb_tpu.train.metrics import CSVMetricsLogger, roi_metric_names


def test_thousand_roi_columns(tmp_path):
    log = CSVMetricsLogger(tmp_path, "prod")
    t0 = time.perf_counter()
    for step in range(50):
        log.log_metrics({"train/brain_loss": 0.5, "lr-AdamW": 1e-4}, step, 0)
    for e in range(10):
        row = {"val/brain_loss": 0.4}
        row.update({n: 0.1 for n in roi_metric_names(1000)})
        row["val_corr_avg"] = 0.1
        log.log_metrics(row, 100 + e, e)
    elapsed = time.perf_counter() - t0

    df = pd.read_csv(log.path)
    assert df["val/brain_loss"].notna().sum() == 10
    assert len([c for c in df.columns if "ROI" in c]) == 1000
    # Train rows written before the val columns appeared must parse as NaN.
    assert df.iloc[0]["val_corr_ROI_000000"] != df.iloc[0]["val_corr_ROI_000000"]
    assert elapsed < 10.0
