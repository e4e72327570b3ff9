"""Pure-Python parity oracle.

Independent re-implementations of the engine's row-level semantics
(ported from the cited reference sites where the semantics originate)
used by the pytest suite to verify the Spark expressions bit-for-bit on
small fixtures. Never imported by the engine itself.
"""
