

def finite_or_null(col):
    """Non-finite measurement contract (r9 NaN/Inf fuzz class): NaN and
    +/-Inf are treated as MISSING — normalized to NULL so every
    NULL-skipping aggregate (avg/sum/median/stddev) handles them with
    one rule on both engines. This is the batch mirror of
    st_running_stats' isfinite contract and the ingest guard's
    quarantine (pipeline.py): a corrupt sensor reading must not crash
    an ANSI cents-cast with a long overflow, blow up a DuckDB
    STDDEV_SAMP, or silently drag a weekly mean to infinity.

    Oracle-side twin: CASE WHEN isfinite(x) THEN x END.
    """
    from pyspark.sql import functions as F

    inf = float("inf")
    return F.when(
        col.isNotNull() & ~F.isnan(col) & (F.abs(col) != inf), col
    )
