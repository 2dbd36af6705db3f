"""Scalar function layer: net/addr helpers, presentation, dynamic names."""
