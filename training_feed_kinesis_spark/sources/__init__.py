"""Source/sink connectors (Kinesis config + the CI file-replay substitute)."""
