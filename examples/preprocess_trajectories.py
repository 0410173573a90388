"""End-to-end mobility preprocessing example.

Mirrors the reference's examples/preprocess_trajectories.py on the
engine's fluent accessor API: read a raw corpus, detect staypoints,
triplegs, locations, trips, then compute analysis outputs and prepare
plot layers. Runs on the reference's checked-in Geolife sample so it
works out of the box:

    python examples/preprocess_trajectories.py [geolife_dir]

Rendering happens only if matplotlib is installed (it is optional);
the plot-layer preparation — the distributed part — always runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trackintel_spark import Positionfixes, get_spark
from trackintel_spark.analysis import calculate_modal_split, predict_transport_mode
from trackintel_spark.sources import read_geolife
from trackintel_spark.visualization import prepare_plot_layers


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/data/geolife_long"
    spark = get_spark(app_name="preprocess_trajectories")
    spark.sparkContext.setLogLevel("ERROR")

    pfs = Positionfixes(read_geolife(spark, corpus))
    print(f"positionfixes: {pfs.df.count()}")

    pfs, sp = pfs.generate_staypoints(method="sliding", dist_threshold=100, time_threshold=5)
    print(f"staypoints: {sp.df.count()}")

    sp, locs = sp.create_activity_flag(time_threshold=15).generate_locations(
        epsilon=100, num_samples=3
    )
    print(f"locations: {locs.df.count()}")

    pfs, tpls = pfs.generate_triplegs(sp)
    print(f"triplegs: {tpls.df.count()}")

    sp2, tpls2, trips = sp.generate_trips(tpls.df)
    print(f"trips: {trips.count()}")

    modes = predict_transport_mode(tpls.df)
    split = calculate_modal_split(modes, freq="D", metric="count")
    print("modal split buckets:", split.count())

    # multi-resolution heatmap cells (one point shuffle, levels roll up)
    from pyspark.sql import functions as F

    from trackintel_spark.analysis import grid_rollup

    cells = grid_rollup(
        pfs.df.select("user_id", F.col("geom.lon").alias("lon"), F.col("geom.lat").alias("lat")),
        levels=4, base_cell_deg=0.002, user_col="user_id",
    )
    per_level = {r.level: r.cells for r in
                 cells.groupBy("level").agg(F.count(F.lit(1)).alias("cells")).collect()}
    print("heatmap rollup cells per level:", dict(sorted(per_level.items())))

    layers = prepare_plot_layers(
        positionfixes=pfs.df, staypoints=sp2, locations=locs.df, max_rows_per_layer=5000
    )
    print(
        "plot layers:",
        {k: len(v) for k, v in {
            "pfs": layers.positionfixes, "sp": layers.staypoints, "locs": layers.locations,
        }.items() if v is not None},
        "bbox:", tuple(round(b, 4) for b in layers.bbox),
    )
    try:
        from trackintel_spark.visualization import plot

        plot(positionfixes=pfs.df, staypoints=sp2, locations=locs.df,
             filename="/tmp/trajectories.png")
        print("rendered /tmp/trajectories.png")
    except ImportError:
        print("matplotlib not installed; skipped rendering")


if __name__ == "__main__":
    main()
