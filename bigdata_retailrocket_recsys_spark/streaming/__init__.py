from bigdata_retailrocket_recsys_spark.streaming.sessionize_stream import (
    run_streaming_sessionize,
    streaming_session_stats,
)

__all__ = ["run_streaming_sessionize", "streaming_session_stats"]
