"""Model families. Whisper encoder-decoder is the flagship."""
