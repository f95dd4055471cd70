from sequenzo_spark.streaming.rollup_stream import streaming_state_counts_1m

__all__ = ["streaming_state_counts_1m"]
