"""On-device visualization (the OpenGL replacement)."""
