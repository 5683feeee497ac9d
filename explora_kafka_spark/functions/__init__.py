"""Scalar function modules (geo codecs, time truncation, text metrics)."""
