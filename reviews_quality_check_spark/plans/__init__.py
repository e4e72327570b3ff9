"""Suite compilation & execution: declarative Checks → one-pass plans →
per-partition verdicts, violation rows, lineage, checkpoint/resume."""
