"""Evaluation: trajectory alignment / ATE, image quality, keyframe scoring."""
