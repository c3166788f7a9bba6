"""The day-one real-artifact runbook, driven end to end on tiny fixtures.

`scripts/parity_real.py` is the one command to run when the real
VideoLLaMA2-7B shards / shipped tokenizer become available (VERDICT r4
ask 7; reference weights contract litmodule.py:74-82).  Real artifacts
cannot exist on this box, so this drives every stage on the synthetic
tiny checkpoint with the production key layout (the same fixture as
test_pretrained_loading) — proving the runbook itself runs, catches
mismatches, and exits 0 on a coherent checkpoint.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from test_pretrained_loading import _make_checkpoint, _tiny_cfg  # noqa: E402


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("real_ckpt")
    cfg = _tiny_cfg(scan=False)
    _make_checkpoint(tmp, cfg)
    m = cfg.mistral
    (tmp / "config.json").write_text(json.dumps({
        "vocab_size": m.vocab_size, "hidden_size": m.hidden_size,
        "intermediate_size": m.intermediate_size,
        "num_hidden_layers": m.num_hidden_layers,
        "num_attention_heads": m.num_attention_heads,
        "num_key_value_heads": m.num_key_value_heads,
        "rope_theta": m.rope_theta, "rms_norm_eps": m.rms_norm_eps,
    }))
    return tmp, cfg


def _run_main(mod, argv):
    old = sys.argv
    sys.argv = ["parity_real.py"] + argv
    try:
        return mod.main()
    finally:
        sys.argv = old


def test_runbook_passes_on_coherent_checkpoint(tiny_ckpt):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import parity_real

    tmp, cfg = tiny_ckpt
    rc = _run_main(parity_real, [
        "--ckpt", str(tmp), "--tiny", "--clip-heads",
        str(cfg.clip.num_attention_heads), "--seq", "8", "--tol", "2e-3",
    ])
    assert rc == 0


def test_runbook_fails_on_architecture_mismatch(tiny_ckpt, tmp_path):
    """An extra mm_projector key (wrong STC assumption) must fail loudly."""
    from safetensors.numpy import save_file

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import parity_real

    tmp, cfg = tiny_ckpt
    # copy the shard + inject a BatchNorm running-stat key the converter
    # can never consume
    from phantom_vlb_tpu.models.convert import load_safetensors_dir

    sd = dict(load_safetensors_dir(tmp))
    sd["model.mm_projector.s1.b1.conv1.bn.running_mean"] = np.zeros(
        cfg.stc.hidden_size, np.float32)
    out = tmp_path / "bad_ckpt"
    out.mkdir()
    save_file(sd, out / "model.safetensors")
    (out / "config.json").write_text((tmp / "config.json").read_text())

    rc = _run_main(parity_real, [
        "--ckpt", str(out), "--tiny", "--skip", "mistral,clip",
    ])
    assert rc == 1
