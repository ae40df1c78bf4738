#!/usr/bin/env python3
"""Tile a testdata SF directory N times with shifted keys, producing a
scaled fixture for LOCAL scale-out measurements (the sf0.1 bench is
commit-bound: per-gate protocol constants swamp data parallelism, so
8-vs-32-core ratios say nothing about the scan-bound operators'
scale-out shape — see OPTIMIZATION_r19.md §6). The output is NOT a
driver fixture: results over it have no oracle; it exists so
`SPARK_GRAFT_BENCH_ONLY=q02,q04,... SPARK_GRAFT_SF_DIR=<out>` can
demonstrate data-parallel speedup on the scan-bound families.

Usage: tools/replicate_sf.py <src_sf_dir> <out_dir> <times>
Key columns are shifted per tile so distincts/joins keep their
selectivity instead of collapsing onto the same keys.
"""
import sys, glob, os
import pyarrow as pa
import pyarrow.parquet as pq

SHIFT = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
    "events": {"event_id": 10_000_000},
}

def main(src, out, times):
    os.makedirs(out, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.splitext(os.path.basename(f))[0]
        t = pq.read_table(f)
        shifts = SHIFT.get(name, {})
        tiles = []
        for i in range(times):
            if i == 0 or not shifts:
                tiles.append(t)
                continue
            cols = []
            for cn in t.column_names:
                c = t.column(cn)
                if cn in shifts:
                    import pyarrow.compute as pc
                    c = pc.add(c, shifts[cn] * i)
                cols.append(c)
            tiles.append(pa.table(cols, names=t.column_names))
        big = pa.concat_tables(tiles)
        pq.write_table(big, os.path.join(out, f"{name}.parquet"),
                       row_group_size=1_000_000)
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
