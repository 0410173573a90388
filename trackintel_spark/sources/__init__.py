from trackintel_spark.sources.csv import (
    read_locations_csv,
    read_positionfixes_csv,
    read_staypoints_csv,
    read_tours_csv,
    read_triplegs_csv,
    read_trips_csv,
    write_locations_csv,
    write_positionfixes_csv,
    write_staypoints_csv,
    write_tours_csv,
    write_triplegs_csv,
    write_trips_csv,
)
from trackintel_spark.sources.geolife import (
    geolife_add_modes_to_triplegs,
    read_geolife,
    read_geolife_labels,
)
from trackintel_spark.sources.postgis import *  # noqa: F401,F403 — per-entity read/write_*_postgis + read_*_gpd
from trackintel_spark.sources.gpx import read_gpx
from trackintel_spark.sources.tar import read_tar_members, read_webdataset
from trackintel_spark.sources.warc import parse_warc_frame, read_warc, read_warc_responses, read_warc_stream, read_wet
from trackintel_spark.sources.jdbc import read_entity_jdbc, write_entity_jdbc
from trackintel_spark.sources.jsonl import read_documents_jsonl, write_documents_jsonl
from trackintel_spark.sources.mzmv import read_mzmv
from trackintel_spark.sources.testdata import load_table

__all__ = [
    "load_table",
    "read_geolife",
    "read_geolife_labels",
    "read_gpx",
    "read_tar_members",
    "read_webdataset",
    "parse_warc_frame",
    "read_warc",
    "read_warc_stream",
    "read_warc_responses",
    "read_wet",
    "read_mzmv",
    "read_documents_jsonl",
    "write_documents_jsonl",
    "read_entity_jdbc",
    "write_entity_jdbc",
    "geolife_add_modes_to_triplegs",
    "read_positionfixes_csv",
    "read_staypoints_csv",
    "read_triplegs_csv",
    "read_trips_csv",
    "read_locations_csv",
    "read_tours_csv",
    "write_positionfixes_csv",
    "write_staypoints_csv",
    "write_triplegs_csv",
    "write_trips_csv",
    "write_locations_csv",
    "write_tours_csv",
]
