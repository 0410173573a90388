from trackintel_spark.streaming.dedup import dedup_stream, url_dedup_stream
from trackintel_spark.streaming.embmatch import embedding_match_stream, index_embedding_corpus
from trackintel_spark.streaming.flows import od_flows_stream
from trackintel_spark.streaming.heatmap import grid_counts_stream
from trackintel_spark.streaming.locations_state import locations_stream_exact
from trackintel_spark.streaming.neardup import neardup_stream, resolve_neardup
from trackintel_spark.streaming.sessionize import sessionize_stream, staypoints_stream
from trackintel_spark.streaming.staypoints_state import staypoints_stream_exact
from trackintel_spark.streaming.tours_state import attach_trip_locations, tours_stream_exact
from trackintel_spark.streaming.trajmatch import index_trajectory_corpus, trajectory_match_stream
from trackintel_spark.streaming.triplegs_state import triplegs_stream_exact
from trackintel_spark.streaming.trips_state import trips_stream_exact
from trackintel_spark.streaming.web import robots_gate_stream

__all__ = ["attach_trip_locations", "dedup_stream", "url_dedup_stream", "locations_stream_exact",
    "od_flows_stream",
    "grid_counts_stream",
    "neardup_stream", "resolve_neardup",
    "sessionize_stream", "staypoints_stream",
    "staypoints_stream_exact", "tours_stream_exact",
    "index_trajectory_corpus", "trajectory_match_stream",
    "triplegs_stream_exact", "trips_stream_exact",
    "robots_gate_stream",
    "embedding_match_stream", "index_embedding_corpus"]
