"""Z-order layout: per-file min-max stats must tighten on BOTH key
columns vs an unclustered write — measured from real parquet footers."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tests.conftest import SF_SMOKE


def _file_ranges(path: str, col: str) -> list[float]:
    """Per-file (max-min) width of ``col`` from parquet footer stats."""
    import pyarrow.parquet as pq

    widths = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(
                next(
                    i
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
            ).statistics
            lo = stats.min if lo is None else min(lo, stats.min)
            hi = stats.max if hi is None else max(hi, stats.max)
        widths.append(float(hi - lo))
    return widths


def test_zorder_tightens_stats_on_both_columns(spark, tmp_path):
    from tw_etl_spark.operators.zorder import write_zordered

    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_files = 8

    base = str(tmp_path / "plain")
    li.repartition(n_files).write.parquet(base)  # unclustered layout
    zpath = str(tmp_path / "zorder")
    write_zordered(li, zpath, "l_orderkey", "l_partkey", num_files=n_files)

    # same data back
    assert spark.read.parquet(zpath).count() == li.count()

    for col in ("l_orderkey", "l_partkey"):
        plain_avg = sum(_file_ranges(base, col)) / n_files
        z_avg = sum(_file_ranges(zpath, col)) / len(_file_ranges(zpath, col))
        # every random-layout file spans ~the full domain; z-order files
        # must cover a strictly smaller box on BOTH dimensions
        assert z_avg < 0.75 * plain_avg, (col, z_avg, plain_avg)

    # and skipping actually fires: a narrow range predicate on either
    # column intersects fewer z-ordered files than unclustered ones
    # (footer-stat pruning = skip files whose [min,max] misses the range)
    def hits(path: str, col: str, lo: float, hi: float) -> int:
        import pyarrow.parquet as pq

        n = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                ci = next(
                    i
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                st = md.row_group(rg).column(ci).statistics
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
            if fmax >= lo and fmin <= hi:
                n += 1
        return n

    for col in ("l_orderkey", "l_partkey"):
        vals = sorted(r[0] for r in li.select(col).collect())
        lo, hi = vals[len(vals) // 2], vals[len(vals) // 2 + len(vals) // 20]
        assert hits(zpath, col, lo, hi) < hits(base, col, lo, hi), col
