"""Native (C++) runtime components.

The reference is pure Julia with no native code; this framework's dynamic
reactive path gets a C++ core for the hot state machine
(:class:`NativeSignalEngine` — bit-packed dependency flags, O(listeners)
notification with precomputed slots, SWAR pending checks), compiled on demand
with the system toolchain and bound via ctypes.  Values and rule dispatch stay
in Python; graph state transitions run native.
"""

from .bindings import NativeSignal, NativeSignalEngine, load_native_lib

__all__ = ["NativeSignalEngine", "NativeSignal", "load_native_lib"]
