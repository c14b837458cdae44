"""Utilities: native audio IO (ctypes over the C++ decoder), logging."""
