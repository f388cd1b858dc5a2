"""CLI for building the item-image LMDB from a directory of JPEGs.

Script-surface parity with /root/reference/Dataset/build_lmdb.py:25-86
(its __main__ loops hard-coded dataset names; here the paths are flags).
Writes the same record layout (pickled LMDBImage keyed by item name,
plus __keys__/__len__) and the bad-file TSV report (build_lmdb.py:84-86).
Uses the real ``lmdb`` package when installed, else the pure-Python
backend (iisan_tpu/data/lmdbfile.py) which writes the same on-disk LMDB
format — output is readable by liblmdb tooling either way.

    iisan-tpu-build-lmdb --items <items.tsv> --images <jpeg_dir> \
        --out image.lmdb [--commit-every 5000] [--bad-report lmdb_bad_file.tsv]

(also runnable as ``python scripts/build_lmdb.py`` from a checkout)
"""

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", required=True, help="item TSV (name\\ttitle)")
    ap.add_argument("--images", required=True, help="directory of <name>.jpg")
    ap.add_argument("--out", required=True, help="output LMDB path")
    ap.add_argument("--commit-every", type=int, default=5000)
    ap.add_argument("--bad-report", default="lmdb_bad_file.tsv")
    args = ap.parse_args(argv)

    from iisan_tpu.data.images import LMDB_IS_PUREPY, build_lmdb

    if LMDB_IS_PUREPY:
        print("note: 'lmdb' package not installed - using the pure-Python "
              "LMDB-format writer (iisan_tpu/data/lmdbfile.py)")
    bad = build_lmdb(args.items, args.images, args.out,
                     commit_every=args.commit_every)
    print(f"done; {len(bad)} bad files")
    if bad:
        with open(args.bad_report, "w") as f:
            for name in bad:
                f.write(f"{name}\n")
        print(f"bad-file report: {args.bad_report}")


if __name__ == "__main__":
    main()
