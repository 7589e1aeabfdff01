#!/usr/bin/env python
"""Dataset provisioning — port of the reference's dataset.sh.

The reference downloads SIFT-small from irisa.fr (reference: dataset.sh:4-10).
This environment has no network egress, so by default this script *generates*
a synthetic SIFT-style dataset (same file layout, exact brute-force ground
truth). Pass --download to attempt the original fetch where egress exists.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="sift/siftsmall")
    p.add_argument("--prefix", default="siftsmall")
    p.add_argument("--nbase", type=int, default=10_000)
    p.add_argument("--ntrain", type=int, default=25_000)
    p.add_argument("--nquery", type=int, default=100)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--clusters", type=int, default=200)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--download", action="store_true",
                   help="fetch the real SIFT archive instead of generating")
    p.add_argument("--hard", action="store_true",
                   help="overlapping heavy-tailed workload (recall<1 at "
                        "the BASELINE operating point)")
    args = p.parse_args()

    if args.download:
        import shutil
        import subprocess
        import tarfile
        import urllib.request

        url = "ftp://ftp.irisa.fr/local/texmex/corpus/siftsmall.tar.gz"
        print(f"downloading {url} ...", file=sys.stderr)
        fname, _ = urllib.request.urlretrieve(url)
        with tarfile.open(fname) as tf:
            tf.extractall(args.out + "/..")
        return

    from prefhetch_tpu.data.synthetic import write_sift_style_dataset

    paths = write_sift_style_dataset(
        args.out,
        prefix=args.prefix,
        hard=args.hard,
        nbase=args.nbase,
        ntrain=args.ntrain,
        nquery=args.nquery,
        d=args.d,
        n_clusters=args.clusters,
        gt_k=100,
        seed=args.seed,
    )
    for k, v in paths.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
