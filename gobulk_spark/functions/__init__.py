"""Scalar/vector helper functions: image codec, hashing, text features, scrub."""
