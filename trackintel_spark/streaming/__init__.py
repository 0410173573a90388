from trackintel_spark.streaming.sessionize import sessionize_stream, staypoints_stream

__all__ = ["sessionize_stream", "staypoints_stream"]
