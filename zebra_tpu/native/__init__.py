"""Native host-side components (C++, ctypes-loaded).

``ingest`` wraps the fast event-stream parser in ``ingest.cc``; it builds
on first use (g++ -O2 -shared) into this directory and transparently falls
back to the pure-Python/pandas path when a toolchain is unavailable."""

from zebra_tpu.native.ingest import load_events, native_available

__all__ = ["load_events", "native_available"]
