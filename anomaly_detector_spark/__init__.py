"""anomaly_detector_spark — a PySpark-native schema + constraint validation engine.

A from-scratch, Spark-first re-expression of the capabilities of
SENERGY-Platform/anomaly-detector (reference at /root/reference, studied
for semantics only — see SURVEY.md). The reference's per-key windowed
outlier kernel over a Kafka time-series stream is reframed as a
partition-parallel data-quality engine over a large table of source-code
files ``(repo, path, commit, lang, content)``:

* per-column / per-partition statistics  (checks.stats)
* uniqueness on (repo, path, commit)     (checks.uniqueness)
* referential lang vs allowed dimension  (checks.referential)
* distribution drift (PSI / two-sample KS) with z-score / IQR flagging
  and a median gate                      (checks.drift)
* per-row sha256(content) invariant      (functions.hashing)
* per-partition lineage + resumable manifest (manifest)
* row-level constraint rules + quarantine (checks.rowrules)
* schema contract vs physical schema     (checks.contract)
* metric-history anomalies over manifest runs (checks.history)
* one-pass table profiler + mergeable heavy-hitter sketches (checks.profile)
* per-partition freshness verdicts       (checks.freshness)
* metadata-only validation from parquet footers (checks.metadata)
* cross-table aggregate reconciliation   (checks.reconcile)
* mergeable t-digest quantile sketches   (checks.quantiles)
* run-over-run violation diffing + CDC-style snapshot diff (plans.diff)
* footer-tier -> scan-suite escalation   (plans.tiered)
* code-hygiene rules: secrets / license / generated / entropy /
  encoding damage / unicode security (Trojan-Source bidi, zero-width,
  tag payloads, homoglyphs; strip + tag-decode twins)
                                         (checks.codehygiene,
                                          operators.codescan)
* path integrity: structural rules, case collisions, lang/ext
  agreement, sensitive filenames (.env / id_rsa / *.pem — leak by
  name) + normalization enforcement      (checks.paths)
* the corpus dedup ladder: content (vendored), line (boilerplate +
  strip), skeleton (formatting variants), partial copies (MOSS
  winnowing containment), directory (copied subtrees), repo
  (fork/mirror pairs)                    (operators.codescan,
  operators.lines, operators.dedup)
* embedding sanity pre-flight (NULL/dim/NaN/Inf/zero-norm)
                                         (operators.similarity)
* markdown validation report from manifest metadata (plans.report)
* media perceptual-hash near-dup (dHash + pigeonhole block join)
                                         (operators.multimodal)
* continuous quantiles / heavy hitters over micro-batches (t-digest
  and truncated-count state, replay-oracle pinned)
                                         (streaming.quantiles,
                                          streaming.topk)

plus large-scale training-data-pipeline operators (operators.dedup,
operators.similarity, operators.text, operators.multimodal, operators.windows)
and a Structured Streaming analog of the reference's stateful loop
(streaming.validate), plus a spark-submit entry point (cli).

Everything is declared with the DataFrame API so Catalyst handles
pushdown, pruning, join selection and AQE; Python only runs inside
Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
