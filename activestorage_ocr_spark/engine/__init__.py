"""Pure-Python/numpy per-document kernels.

No Spark imports allowed in this package: these functions are imported both by
the Spark ``mapInArrow`` kernels and by the golden-fixture oracle, so
"byte-identical extracted text per url" is structural, not lucky
(SURVEY.md §7.3).
"""
