"""Operator library: per-record transforms (SMT analogues), the LWW
compaction kernel, and large-scale training-data operators (dedup,
similarity, text analysis, multimodal plumbing)."""
