"""Driver-side planning: the iterative superstep loop and the pattern→join
plan compiler (the Spark analog of the reference's AnalyzedPattern layer)."""
