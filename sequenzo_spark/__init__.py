"""sequenzo_spark — a from-scratch PySpark-native time-series rollup engine.

Recasts the state-sequence analytics of Liang-Team/Sequenzo (reference at
/root/reference, studied read-only) as continuous aggregates over time buckets
of a long-format transcript table (conv_id, turn_idx, role, text, tool, ts).

Design (see SURVEY.md):
- long format end-to-end; the reference's wide matrix is never materialized;
- every indicator is a DataFrame expression / window function (JVM-side,
  whole-stage codegen); grouped pandas UDFs only where genuinely sequential
  (turbulence subsequence DP, Gorilla codec);
- rollup tiers (1m/1h/1d) carry only *algebraic* state (counts, weighted sums,
  sums of squares, min/max) so higher tiers re-merge lower tiers bit-exactly;
  derived floats (rates, entropy) are recomputed per tier from merged counts.
"""

from sequenzo_spark.session import get_spark

__all__ = ["get_spark", "ensure_workers_can_import"]
__version__ = "0.1.0"

_shipped: set[int] = set()


def ensure_workers_can_import(spark) -> None:
    """Ship this package to executor Python workers (addPyFile zip — the
    spark-submit --py-files mechanism). Grouped pandas UDFs reference
    module-level kernels (Gorilla codec, fivenum, turbulence DP) by module
    path, so workers must be able to import sequenzo_spark regardless of the
    driver's cwd/sys.path. Idempotent per SparkContext."""
    sc = spark.sparkContext
    if id(sc) in _shipped:
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"sequenzo_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    _shipped.add(id(sc))
