"""Attic: kept negative results — real, tested code that measured SLOWER
than the shipped path and that NO config dispatches to.

Kept (not deleted) because each module documents a measured dead end with
the evidence in its docstring and in BASELINE.md's negative-results log,
so future optimization passes don't re-walk it.  Nothing here is part of
the public API; imports are opt-in and explicit.

Contents:

* ``groupnorm_pallas_chunked`` — chunked two-pass Pallas GroupNorm for
  full-resolution slabs; measured 2.8x SLOWER than XLA's fused lowering
  (sequential chunk grid + extra HBM pass lose to XLA's DMA/compute
  overlap).  See BASELINE.md "Round-2 negative results".
"""
