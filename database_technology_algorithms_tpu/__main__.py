"""CLI driver — the heir of the reference's benchmark driver (main.cpp:20-136).

Reproduces the reference pipeline end-to-end on the TPU engine:

    python -m database_technology_algorithms_tpu --nblocks 600 --field 1

1. generate two block files (same distributional shape as main.cpp:41-77,
   but seeded — the reference used time(0));
2. MergeJoin(file1, file2)  — sort → distinct → sorted-intersection;
3. HashJoin on the dedup'd inputs (the reference runs it on MergeJoin's
   intermediate "1outfile.bin"/"2outfile.bin", main.cpp:121);
4. print both pair counts — the reference's own correctness oracle is that
   they agree (verified 167,299 @ 600k rows in BASELINE.md).

Unlike the reference, also writes honest output block files and structured
stats.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> int:
    p = argparse.ArgumentParser(
        prog="database_technology_algorithms_tpu",
        description="TPU-native query engine demo driver (reference main.cpp parity)",
    )
    p.add_argument("--nblocks", type=int, default=600, help="blocks per input file (100 rows each)")
    p.add_argument("--field", default="1", help="join field: 0=recid 1=num 2=str 3=num+str")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--workdir", default=".", help="where input/output .bin files go")
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    p.add_argument("--skip-files", action="store_true", help="keep data in memory, no .bin round-trip")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from .batch import canonical_field
    from .io.blockfile import read_blockfile, write_blockfile
    from .io.generator import generate_batch, generate_pair_files
    from .ops.distinct import distinct
    from .ops.filter import truncate
    from .ops.hash_join import hash_join
    from .ops.merge_join import join_sorted_distinct

    field = canonical_field(args.field)
    t0 = time.time()
    print(f"[gen] {args.nblocks} blocks x 2 files ({args.nblocks * 100} rows each)")
    if args.skip_files:
        r = generate_batch(args.nblocks, seed=args.seed)
        s = generate_batch(args.nblocks, seed=args.seed + 1)
    else:
        f1 = os.path.join(args.workdir, "file.bin")
        f2 = os.path.join(args.workdir, "file2.bin")
        generate_pair_files(f1, f2, args.nblocks, seed=args.seed)
        r, s = read_blockfile(f1), read_blockfile(f2)
    print(f"[gen] done in {time.time() - t0:.2f}s on {jax.devices()[0].platform}")

    print("\n--------------MERGE JOIN-------------------")
    t1 = time.time()
    r_d, nu_r = distinct(r, field)
    s_d, nu_s = distinct(s, field)
    out, nres = join_sorted_distinct(r_d, nu_r, s_d, nu_s, field)
    nres = int(nres)
    dt = time.time() - t1
    print(f"UNIQUE R: {int(nu_r)}  UNIQUE S: {int(nu_s)}")
    print(f"PAIRS IN THE OUTPUT: {nres} OUT OF {r.nrows}")
    print(f"[mergejoin] {dt:.3f}s  ({r.nrows / dt:,.0f} rows/s)")
    if not args.skip_files:
        write_blockfile(
            os.path.join(args.workdir, "outmerge.bin"), truncate(out, nres)
        )

    print("\n--------------HASH JOIN-------------------")
    # reference runs HashJoin on the dedup'd intermediates (main.cpp:121)
    t2 = time.time()
    r_dt, s_dt = truncate(r_d, nu_r), truncate(s_d, nu_s)
    hout, hres = hash_join(r_dt, s_dt, field)
    hres = int(hres)
    dt2 = time.time() - t2
    print(f"PAIRS IN THE OUTPUT: {hres} OUT OF {s.nrows}")
    print(f"[hashjoin] {dt2:.3f}s  ({s_dt.nrows / dt2:,.0f} probe rows/s)")
    if not args.skip_files:
        write_blockfile(os.path.join(args.workdir, "outhash.bin"), truncate(hout, hres))

    agree = nres == hres
    print(
        "\n"
        + json.dumps(
            {
                "nblocks": args.nblocks,
                "field": field,
                "merge_join_pairs": nres,
                "hash_join_pairs": hres,
                "joins_agree": agree,
                "nunique_r": int(nu_r),
                "nunique_s": int(nu_s),
            }
        )
    )
    if not agree:
        print("ERROR: join counts disagree (reference oracle violated)")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
