"""Plain-Python deterministic kernels.

Everything in this package is pure, seed-free, dependency-light Python
(stdlib + numpy only). These functions define the *semantic contract*
of the pipeline: the fixture generator uses them to produce golden
columns, the plain-Python oracle uses them to compute expected triples,
and the Spark stages wrap them in Arrow/pandas UDFs. Because all three
call the exact same code, byte-identical extraction per url and
P/R = 1.0 vs the oracle hold by construction — and any *semantic*
regression breaks the pinned pytest goldens.
"""
