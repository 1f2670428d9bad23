"""First-class training-data-pipeline operators.

* ``dedup``       — exact, MinHash+LSH, SimHash, n-gram Jaccard,
                    embedding-cosine near-dup
* ``similarity``  — brute-force cosine top-k, LSH-bucketed ANN
* ``textstats``   — language-ID, quality scoring, token counting,
                    document fingerprinting
* ``multimodal``  — binary-column decode/feature plumbing (stubbed
                    codecs, real Spark plumbing)

All hot paths are JVM expressions (higher-order array functions) —
no Python in the per-row path — so they stay inside whole-stage
codegen and scale with executor count.
"""
