"""Grid-bucketed proximity self-join.

The reference's single-table workload (``/root/reference/main.py:44``)
never joins a table to itself on closeness, but any analytics engine
over point-like data (embeddings projected to 2-D, geo coordinates,
sensor positions) needs "all pairs within ε" without the O(n²)
cross join. The classic fixed-grid technique: bucket every point into
an ε-sized cell, fan ONE side out to its 3×3 cell neighborhood, and
equi-join on the cell id — any pair with true distance < ε differs by
at most one cell index per axis, so the neighborhood join has exact
recall, and each surviving pair is produced exactly once because the
non-fanned side contributes only its home cell.

Scale shape: the only shuffle is the (cell_x, cell_y) equi-join; the
candidate set is bounded by local point density (Σ|cell|·|3×3 ring|),
never n². Skewed hot cells behave like any skewed join key — AQE skew
split applies, and ε controls the densification directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_proximity_pairs(
    pts: DataFrame,
    eps: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with squared Euclidean
    distance strictly below ``eps**2``, via an ε-grid cell equi-join.

    Returns columns ``id_a, id_b, dist2`` where ``dist2`` is the exact
    double squared distance computed as ``dx*dx + dy*dy`` with the
    lower-id point on the left — bit-identical to a brute-force oracle
    evaluating the same expression on the same role assignment.

    Recall caveat (floating point, measure-zero): cell assignment is
    ``floor(x/eps)`` in doubles, so a qualifying pair whose BOTH
    endpoints sit within ~1 ulp of cell boundaries with opposite
    division roundings AND whose distance is within ~1 ulp of ε can
    land 2 cells apart and miss the 3×3 ring. No such alignment exists
    in any fixture (proven by the brute-force oracle at three scale
    factors); for adversarial coordinate magnitudes quantize
    coordinates to an integer grid upstream, which makes the cell
    arithmetic exact.
    """
    if not eps > 0:
        raise ValueError(f"eps must be positive, got {eps}")
    cell_x = F.floor(F.col(x_col) / F.lit(eps)).cast("long")
    cell_y = F.floor(F.col(y_col) / F.lit(eps)).cast("long")
    home = pts.select(
        F.col(id_col).alias("_pid"),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
        cell_x.alias("cx"),
        cell_y.alias("cy"),
    )
    offsets = F.array(*[F.lit(o) for o in (-1, 0, 1)])
    # Fan only side B to its 3×3 ring: pair (a, b) then matches in
    # exactly one joined cell — a's (unique) home cell — so no distinct
    # pass is needed to dedup multi-cell matches.
    fanned = (
        home.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            F.col("_pid").alias("id_b"),
            F.col("_px").alias("xb"),
            F.col("_py").alias("yb"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    a = home.select(
        F.col("_pid").alias("id_a"),
        F.col("_px").alias("xa"),
        F.col("_py").alias("ya"),
        "cx",
        "cy",
    )
    dxv: Column = F.col("xa") - F.col("xb")
    dyv: Column = F.col("ya") - F.col("yb")
    dist2 = dxv * dxv + dyv * dyv
    return (
        a.join(fanned, ["cx", "cy"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(dist2 < F.lit(eps) * F.lit(eps))
        .select("id_a", "id_b", dist2.alias("dist2"))
    )
