"""Core runtime: checkpointing, logging, profiling, typed config."""
