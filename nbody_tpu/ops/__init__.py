"""Compute ops: bbox, Morton codes, tree build, forces, integration."""
