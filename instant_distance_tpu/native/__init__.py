"""Native C++ host runtime: multithreaded builds, host queries, IO."""

from .cpu import NativeHnsw, available, load_error  # noqa: F401
