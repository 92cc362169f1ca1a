#!/usr/bin/env python3
"""Regenerated-testdata drill (VERDICT r15 ask #6): produce a variant of
/root/testdata that exercises every regeneration axis the driver has
actually moved (or plausibly could) between rounds, so

    SPARK_GRAFT_TESTDATA=/tmp/testdata_variant sbt -batch test

proves the suite pins STRUCTURE, not fixture accidents. Axes varied:

  * parquet physical layout — compression flips snappy<->zstd, row-group
    size shrinks, file is rewritten (new mtimes invalidate /tmp fixture
    caches keyed on uri+len+mtime);
  * row order — every table is written in a hash-permuted order (nothing
    may depend on head rows or on parquet's incidental ordering);
  * events.ts encoding — flipped between TIMESTAMP(NTZ micros) and INT64
    raw nanos, whichever the source is NOT (the exact r8->r9 drift that
    took 14 entries off the scoreboard);
  * embeddings — every vector cyclically rolled by 3 positions: an
    ISOMETRY (all dot products, norms, cosines, and Lloyd trajectories
    modulo coordinate relabeling are preserved), so geometric contracts
    (recall bands, planted pairs) must survive while anything pinned to
    raw coordinate values breaks.

Content values are otherwise preserved: the driver's regenerations keep
the generator recipe (planted near-dups, label structure) and move the
serialization — this drill moves every serialization axis at once.

Usage: tools/make_testdata_variant.py [src_root] [dst_root]
Defaults: /root/testdata -> /tmp/testdata_variant
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import pathlib

SRC = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata")
DST = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_variant")

ROLL = 3  # cyclic embedding roll (isometry)


def permutation(n: int) -> np.ndarray:
    """Deterministic hash permutation of row indices."""
    idx = np.arange(n, dtype=np.int64)
    key = (idx * 2654435761 + 12345) % 2**31
    return np.argsort(key, kind="stable")


def flip_ts(table: pa.Table) -> pa.Table:
    """Flip events.ts between TIMESTAMP micros and INT64 raw nanos."""
    i = table.schema.get_field_index("ts")
    col = table.column("ts")
    t = table.schema.field("ts").type
    if pa.types.is_timestamp(t):
        # -> raw INT64 nanos (what sf pre-r9 shipped)
        nanos = pc.cast(pc.cast(col, pa.timestamp("ns")), pa.int64())
        return table.set_column(i, "ts", nanos)
    # INT64 nanos -> TIMESTAMP_NTZ micros (the r9 encoding)
    micros = pc.cast(pc.divide(pc.cast(col, pa.int64()), 1000),
                     pa.timestamp("us"))
    return table.set_column(i, "ts", micros)


def roll_embeddings(table: pa.Table) -> pa.Table:
    i = table.schema.get_field_index("embedding")
    vecs = np.asarray(table.column("embedding").to_pylist(),
                      dtype=np.float32)
    rolled = np.roll(vecs, ROLL, axis=1)
    arr = pa.array(list(rolled), type=pa.list_(pa.float32()))
    return table.set_column(i, "embedding", arr)


def main() -> None:
    for sf_dir in sorted(SRC.glob("sf*")):
        out_dir = DST / sf_dir.name
        out_dir.mkdir(parents=True, exist_ok=True)
        for f in sorted(sf_dir.glob("*.parquet")):
            table = pq.read_table(f)
            src_comp = "zstd"
            meta = pq.ParquetFile(f).metadata
            if meta.num_row_groups and \
                    "ZSTD" in str(meta.row_group(0).column(0).compression):
                src_comp = "snappy"  # flip whatever the source used
            if f.stem == "events":
                table = flip_ts(table)
            if f.stem == "embeddings":
                table = roll_embeddings(table)
            table = table.take(permutation(table.num_rows))
            pq.write_table(table, out_dir / f.name, compression=src_comp,
                           row_group_size=max(1024, table.num_rows // 7))
            print(f"{sf_dir.name}/{f.name}: {table.num_rows} rows, "
                  f"{src_comp}, ts/emb transforms applied as applicable")


if __name__ == "__main__":
    main()
