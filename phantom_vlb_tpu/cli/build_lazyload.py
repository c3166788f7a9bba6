"""vlb-build-lazyload — stage-2 lazy-load dataset builder CLI.

Mirrors ``videollama2_vlb_lazyloading.py`` (same argument names).
"""

from __future__ import annotations

import argparse
import sys

from phantom_vlb_tpu.data.lazyload_build import (
    LazyloadBuildConfig,
    build_lazyload_dsets,
    infer_geometry,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features_path", required=True)
    p.add_argument("--timeseries_path", required=True)
    p.add_argument("--lazyload_path", required=True)
    p.add_argument("--subject", required=True)
    p.add_argument("--season", required=True)
    p.add_argument("--n_split", type=int, default=4)
    p.add_argument("--delay", type=int, default=3)
    p.add_argument("--window", type=int, default=3)
    args = p.parse_args(argv)

    # Geometry is inferred from the features file (frames/sample, image
    # size, token widths) so builder and extraction can never disagree.
    geometry = infer_geometry(
        args.features_path, window=args.window, delay=args.delay
    )
    paths = build_lazyload_dsets(
        LazyloadBuildConfig(
            features_path=args.features_path,
            timeseries_path=args.timeseries_path,
            lazyload_path=args.lazyload_path,
            subject=args.subject,
            season=args.season,
            n_split=args.n_split,
            geometry=geometry,
        )
    )
    print(f"Built lazy loading dset for {args.subject}, season {args.season}")
    for path in paths:
        print(f"  {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
