"""Checkpoint importers and host-side frame/video IO."""
