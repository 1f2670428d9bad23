"""First-class training-data-pipeline operators.

* ``dedup``       — exact, MinHash+LSH, SimHash, n-gram Jaccard
                    (optional stop-shingle cap), embedding-cosine
                    near-dup (SRP-LSH-blocked scale default),
                    connected-components cluster resolution,
                    paragraph-grain dedup with reconstruction,
                    benchmark n-gram decontamination
* ``similarity``  — brute-force cosine top-k, SRP-LSH-bucketed and
                    IVF approximate top-k
* ``webgraph``    — outlink edge extraction, fixed-iteration integer
                    PageRank (bit-identical across partitionings)
* ``incremental`` — crawl-batch fuzzy dedup against a committed
                    band-signature index (history never recomputed)
* ``textstats``   — language-ID, quality scoring, token counting,
                    document fingerprinting
* ``topk``        — bounded per-group top-k (the window-free
                    sample/vocab/sketch building block)
* ``joins``       — as-of join and time-range join in their
                    equi-join-shaped scale formulations
* ``multimodal``  — binary-column compress/resize (PIL-gated, stub
                    fallback), frame sampling, pseudo-embeddings

All hot paths are JVM expressions (higher-order array functions) —
no Python in the per-row path — so they stay inside whole-stage
codegen and scale with executor count.
"""
