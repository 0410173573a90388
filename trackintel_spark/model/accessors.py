"""Entity accessor classes mirroring the reference's fluent model API.

The reference attaches per-entity accessors to GeoDataFrame subclasses
(model/positionfixes.py:83-156, model/staypoints.py:77-171,
model/triplegs.py:74-139, model/trips.py:113-178, model/locations.py:56-73,
model/tours.py:65-70), so users chain ``pfs.generate_staypoints(...)``
instead of calling module functions. The engine's core stays plain
``DataFrame -> DataFrame`` functions (lazy, Catalyst-visible); this
module is a zero-logic fluent veneer over them so reference users can
port call sites verbatim:

    pfs = Positionfixes(df)
    pfs, sp = pfs.generate_staypoints(dist_threshold=100)
    sp, locs = sp.generate_locations(epsilon=150)

Each accessor validates its schema contract on construction
(``model.schemas.validate``) exactly like the reference's ``validate=True``
constructor path, holds the wrapped DataFrame as ``.df``, and proxies
unknown attributes to it — so ``sp.count()``, ``sp.filter(...)`` work,
with DataFrame-returning calls coming back as plain DataFrames (re-wrap
explicitly when you need the accessor surface again).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trackintel_spark.model.schemas import validate


class _Entity:
    """Shared accessor plumbing: validate-on-construct + proxying."""

    entity: str = ""

    def __init__(self, df: DataFrame, validate_schema: bool = True):
        if validate_schema:
            validate(df, self.entity)
        self.df = df

    # reference: ``obj.as_<entity>`` returns the accessor itself
    def validate(self) -> "_Entity":
        validate(self.df, self.entity)
        return self

    def __getattr__(self, name: str) -> Any:
        # unknown attributes fall through to the wrapped DataFrame
        return getattr(self.df, name)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"{type(self).__name__}({self.df})"

    # -- shared IO (reference _shared_docs write_csv / write_postgis) --------

    def to_csv(self, path: str, sep: str = ";") -> None:
        from trackintel_spark.sources import csv as _csv

        getattr(_csv, f"write_{self.entity}_csv")(self.df, path, sep=sep)

    def to_postgis(
        self,
        url: str,
        table: str,
        mode: str = "error",
        properties: dict[str, str] | None = None,
    ) -> None:
        from trackintel_spark.sources.jdbc import write_entity_jdbc

        write_entity_jdbc(self.df, url, table, self.entity, mode=mode, properties=properties)

    def _center(self, col: str) -> tuple[float, float]:
        row = self.df.agg(
            F.avg(F.col(f"{col}.lon")).alias("lon"), F.avg(F.col(f"{col}.lat")).alias("lat")
        ).first()
        return (row["lon"], row["lat"])


class Positionfixes(_Entity):
    """reference model/positionfixes.py:15-156."""

    entity = "positionfixes"

    @property
    def center(self) -> tuple[float, float]:
        return self._center("geom")

    def generate_staypoints(self, **kwargs) -> tuple["Positionfixes", "Staypoints"]:
        from trackintel_spark.operators.staypoints import generate_staypoints

        pfs, sp = generate_staypoints(self.df, **kwargs)
        return Positionfixes(pfs), Staypoints(sp)

    def generate_triplegs(
        self, staypoints: "Staypoints | DataFrame | None" = None, **kwargs
    ) -> tuple["Positionfixes", "Triplegs"]:
        from trackintel_spark.operators.triplegs import generate_triplegs

        sp = staypoints.df if isinstance(staypoints, _Entity) else staypoints
        pfs, tpls = generate_triplegs(self.df, sp, **kwargs)
        return Positionfixes(pfs), Triplegs(tpls)

    def calculate_distance_matrix(
        self, Y: "_Entity | DataFrame | None" = None, **kwargs
    ) -> DataFrame:
        from trackintel_spark.geogr.distances import calculate_distance_matrix

        other = Y.df if isinstance(Y, _Entity) else Y
        return calculate_distance_matrix(self.df, other, **kwargs)

    def get_speed(self) -> "Positionfixes":
        from trackintel_spark.geogr.distances import get_speed_positionfixes

        return Positionfixes(get_speed_positionfixes(self.df))


class Staypoints(_Entity):
    """reference model/staypoints.py:15-171."""

    entity = "staypoints"

    @property
    def center(self) -> tuple[float, float]:
        return self._center("geom")

    def generate_locations(self, **kwargs) -> tuple["Staypoints", "Locations"]:
        from trackintel_spark.operators.locations import generate_locations

        sp, locs = generate_locations(self.df, **kwargs)
        return Staypoints(sp), Locations(locs)

    def merge_staypoints(
        self, triplegs: "Triplegs | DataFrame", max_time_gap: float = 10.0, agg=None
    ) -> "Staypoints":
        from trackintel_spark.operators.merge import merge_staypoints

        tpls = triplegs.df if isinstance(triplegs, _Entity) else triplegs
        return Staypoints(
            merge_staypoints(self.df, tpls, max_time_gap=max_time_gap, agg=agg),
            validate_schema=False,  # merged output keeps agg-selected extras only
        )

    def create_activity_flag(self, **kwargs) -> "Staypoints":
        from trackintel_spark.analysis.labelling import create_activity_flag

        return Staypoints(create_activity_flag(self.df, **kwargs))

    def spatial_filter(self, areas: DataFrame, method: str = "within") -> "Staypoints":
        from trackintel_spark.geogr.filter import spatial_filter

        return Staypoints(spatial_filter(self.df, areas, method=method))

    def temporal_tracking_quality(self, granularity: str = "all") -> DataFrame:
        from trackintel_spark.analysis.tracking_quality import temporal_tracking_quality

        return temporal_tracking_quality(self.df, granularity=granularity)

    def location_entropy(self, method: str = "uncorrelated") -> DataFrame:
        """Song et al. 2010 mobility entropy over the location-visit
        sequence (requires a ``location_id`` column, e.g. from
        generate_locations)."""
        from trackintel_spark.analysis.entropy import location_entropy

        return location_entropy(self.df, method=method)

    def generate_trips(
        self, triplegs: "Triplegs | DataFrame", gap_threshold: float = 15.0, add_geometry: bool = True
    ) -> tuple["Staypoints", "Triplegs", "Trips"]:
        from trackintel_spark.operators.trips import generate_trips

        tpls = triplegs.df if isinstance(triplegs, _Entity) else triplegs
        sp, tpls_out, trips = generate_trips(
            self.df, tpls, gap_threshold=gap_threshold, add_geometry=add_geometry
        )
        return Staypoints(sp), Triplegs(tpls_out), Trips(trips, validate_schema=add_geometry)

    def radius_gyration(self, method: str = "count", metric: str = "haversine") -> DataFrame:
        from trackintel_spark.analysis.metrics import radius_gyration

        return radius_gyration(self.df, method=method, metric=metric)

    def jump_length(self, metric: str = "haversine") -> DataFrame:
        from trackintel_spark.analysis.metrics import jump_length

        return jump_length(self.df, metric=metric)


class Triplegs(_Entity):
    """reference model/triplegs.py:15-139."""

    entity = "triplegs"

    def calculate_distance_matrix(
        self, Y: "_Entity | DataFrame | None" = None, **kwargs
    ) -> DataFrame:
        """reference geogr/distances.py:89-186: X-only → upper-triangle
        self-pairs; with Y → the full len(X) x len(Y) combination set."""
        from trackintel_spark.geogr.trajectory_distance import trajectory_distance_matrix

        other = Y.df if isinstance(Y, _Entity) else Y
        return trajectory_distance_matrix(self.df, Y=other, **kwargs)

    def spatial_filter(self, areas: DataFrame, method: str = "within") -> "Triplegs":
        from trackintel_spark.geogr.filter import spatial_filter

        return Triplegs(spatial_filter(self.df, areas, method=method))

    def generate_trips(
        self, staypoints: "Staypoints | DataFrame", gap_threshold: float = 15.0, add_geometry: bool = True
    ) -> tuple["Staypoints", "Triplegs", "Trips"]:
        sp = staypoints if isinstance(staypoints, Staypoints) else Staypoints(staypoints)
        return sp.generate_trips(self, gap_threshold=gap_threshold, add_geometry=add_geometry)

    def predict_transport_mode(self, **kwargs) -> "Triplegs":
        from trackintel_spark.analysis.labelling import predict_transport_mode

        return Triplegs(predict_transport_mode(self.df, **kwargs))

    def calculate_modal_split(self, **kwargs) -> DataFrame:
        from trackintel_spark.analysis.modal_split import calculate_modal_split

        return calculate_modal_split(self.df, **kwargs)

    def temporal_tracking_quality(self, granularity: str = "all") -> DataFrame:
        from trackintel_spark.analysis.tracking_quality import temporal_tracking_quality

        return temporal_tracking_quality(self.df, granularity=granularity)

    def get_speed(
        self, positionfixes: "Positionfixes | DataFrame | None" = None, method: str = "tpls_speed"
    ) -> "Triplegs":
        from trackintel_spark.geogr.distances import get_speed_triplegs

        pfs = positionfixes.df if isinstance(positionfixes, _Entity) else positionfixes
        return Triplegs(get_speed_triplegs(self.df, pfs, method=method))


class Trips(_Entity):
    """reference model/trips.py:15-178."""

    entity = "trips"

    def temporal_tracking_quality(self, granularity: str = "all") -> DataFrame:
        from trackintel_spark.analysis.tracking_quality import temporal_tracking_quality

        return temporal_tracking_quality(self.df, granularity=granularity)

    def generate_tours(
        self, staypoints: "Staypoints | DataFrame | None" = None, **kwargs
    ) -> tuple["Trips", "Tours"]:
        from trackintel_spark.operators.tours import generate_tours

        sp = staypoints.df if isinstance(staypoints, _Entity) else staypoints
        trips, tours = generate_tours(self.df, sp, **kwargs)
        return Trips(trips, validate_schema=False), Tours(tours)

    def origin_destination_matrix(
        self, staypoints: "Staypoints | DataFrame | None" = None, **kwargs
    ) -> DataFrame:
        """Location-level OD flows (analysis/flows.py); pass staypoints
        carrying the zone column (default location_id)."""
        from trackintel_spark.analysis.flows import origin_destination_matrix

        sp = staypoints.df if isinstance(staypoints, _Entity) else staypoints
        return origin_destination_matrix(self.df, sp, **kwargs)


class Locations(_Entity):
    """reference model/locations.py:15-73."""

    entity = "locations"

    def spatial_filter(self, areas: DataFrame, method: str = "within") -> "Locations":
        from trackintel_spark.geogr.filter import spatial_filter

        return Locations(spatial_filter(self.df, areas, method=method, geom_col="center"))


class Tours(_Entity):
    """reference model/tours.py:15-70."""

    entity = "tours"

    def flag_journeys(self, staypoints) -> "Tours":
        """Add the model's optional ``journey`` column (reference
        model/tours.py:25,30) from purpose-labeled staypoints."""
        from trackintel_spark.operators.tours import flag_journeys

        sp = staypoints.df if isinstance(staypoints, _Entity) else staypoints
        return Tours(flag_journeys(self.df, sp), validate_schema=False)
