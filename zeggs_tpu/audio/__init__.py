"""Audio utilities: loudness metering (host-side DSP)."""
