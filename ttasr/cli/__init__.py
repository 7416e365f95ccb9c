"""Command-line entry points: batch transcription and training."""
