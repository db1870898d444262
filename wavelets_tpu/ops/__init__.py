"""Compute engines: filter bank, lifting, wavelet packets, MODWT."""

from . import filter_fb, lifting, wpt, modwt

__all__ = ["filter_fb", "lifting", "wpt", "modwt"]
