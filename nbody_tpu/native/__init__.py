"""Native (C++) host runtime — IC generation, fast dumps, golden IO."""
