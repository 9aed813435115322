#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala's two 2k-line map literals
into per-family entry objects (queries + oracles adjacent per family).
Idempotence not needed — run once, review, delete or keep for history."""
import re, sys, os

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT = "src/main/scala/graft/entries"

FAMILIES = {
 "RbqlEntries": """q_select_where q_top q_agg_group q_agg_global q_median_var
   q_any_value q_any_value_multi q_array_agg q_array_agg_cb q_sum_int
   q_join_inner q_join_left q_strict_left q_update q_except q_distinct
   q_distinct_count q_unnest q_pipe q_like q_scalar_case q_nr q_events_agg
   q_json""",
 "TemporalEntries": """q_sessions q_paths q_basket q_seasonal q_latency
   q_trend q_dau q_dau_sketch q_markov q_ewma q_anomaly q_asof q_asof_fwd
   q_asof_near q_session_window q_merge_intervals q_rolling q_funnel
   q_funnel_win q_retention q_topk_group q_gaps q_changepoint q_interval
   q_overlap""",
 "ProfilingEntries": """q_skyline q_skyline3 q_profile q_welch q_psi_by
   q_ks_by q_ks q_cat_drift q_mi q_corr q_psi q_cardinality_gate
   q_top_values q_top_values_approx q_top_values_by q_top_values_by_approx
   q_histogram q_quantiles q_quantiles_by q_mad q_winsor q_quantiles_gate
   q_quantiles_by_gate q_schema_diff q_benford q_orphans q_order_viol
   q_autohist q_hll_gate q_cms_gate q_rollup q_pareto q_hhi q_keyuniq
   q_pctrank q_kanon q_pivot q_trimmed q_props q_snapshot_diff q_cdc
   q_canary""",
 "DedupEntries": """q_fuzzy q_editdist q_snm q_entities q_template_dedup
   q_dedup_exact q_dedup_tokenset q_minhash_pairs q_ngram_pairs
   q_tfidf_pairs q_contain q_contain_bloom q_decon q_boilerplate q_coverage
   q_incr q_spans q_clean q_dedup_report q_dedup_by_source q_simhash
   q_simhash_recall q_semdedup q_semdedup_recall q_triangles q_cc_clusters
   q_cc_dedup q_cc_best q_embed_dups""",
 "TextEntries": """q_compress_gate q_text_stats q_line_stats q_quality_rep
   q_chunks q_norm q_pii_scrub q_top_ngrams q_keywords q_zipf q_vocab_cov
   q_script q_trigram q_lm_score q_ppl_buckets q_fertility q_bpe q_gopher
   q_char_entropy q_pmi q_bm25 q_rbo q_search_idx q_rrf""",
 "SamplingEntries": """q_sample q_weighted_sample q_weighted_by q_cap_source
   q_shuffle q_safe_split q_split_exact q_balance q_negatives q_split
   q_multimodal q_pack q_pack_asm q_dsir_weights q_dsir_sample q_nb_quality
   q_auc q_confusion q_calibration q_lr_step q_mix_temp q_mix q_repeat""",
 "EmbeddingEntries": """q_zorder_gate q_hilbert_gate q_ivf_prune q_zvalue
   q_compact_gate q_embed_drift q_pool q_sq q_rp_gate q_pca_gate
   q_embed_scores q_knn_join q_hardneg q_sq8_topk q_ann_recall q_ivf_recall
   q_kmeans q_kmeans_reload q_pq_recall q_pq256_recall q_ivfpq_recall
   q_ivfpq_res_recall q_ann_topk q_ivf_topk""",
}
FAMILIES = {k: v.split() for k, v in FAMILIES.items()}
FAM_OF = {}
for fam, names in FAMILIES.items():
    for n in names:
        assert n not in FAM_OF, f"{n} in two families"
        FAM_OF[n] = fam

lines = open(SRC).read().split("\n")

ENTRY = re.compile(r"^    \"([a-zA-Z0-9_]+)\" ->")

def map_region(start_marker, stop_marker):
    """(first_line_idx_after_Map(, closing_line_idx) of a `= Map(` literal."""
    s = next(i for i, l in enumerate(lines) if start_marker in l)
    stop = next(i for i, l in enumerate(lines) if stop_marker in l and i > s)
    # closing "  )" is the last such line before stop
    close = max(i for i in range(s, stop) if re.match(r"^  \)\s*$", lines[i]))
    return s + 1, close

def split_entries(lo, hi):
    """[(name, [lines])] — each block includes its preceding comment run."""
    starts = [i for i in range(lo, hi) if ENTRY.match(lines[i])]
    out = []
    for j, st in enumerate(starts):
        name = ENTRY.match(lines[st]).group(1)
        a = st
        while a - 1 >= lo and re.match(r"^\s*//", lines[a - 1]):
            a -= 1
        out.append((name, a, st))
    blocks = []
    for j, (name, a, st) in enumerate(out):
        end = out[j + 1][1] if j + 1 < len(out) else hi
        blk = lines[a:end]
        while blk and blk[-1].strip() == "":
            blk.pop()
        if not blk[-1].rstrip().endswith(","):
            blk[-1] = blk[-1].rstrip() + ","
        blocks.append((name, blk))
    return blocks

qlo, qhi = map_region("def queries: Map", "Row bound for the recall-gate")
# oracleSql runs to the last "  )" of the file (before the closing "}")
s = next(i for i, l in enumerate(lines) if "def oracleSql: Map" in l)
close = max(i for i in range(s, len(lines)) if re.match(r"^  \)\s*$", lines[i]))
olo, ohi = s + 1, close

qblocks = split_entries(qlo, qhi)
oblocks = split_entries(olo, ohi)

qnames = [n for n, _ in qblocks]
onames = [n for n, _ in oblocks]
assert len(qnames) == len(set(qnames)), "dup query entries"
assert len(onames) == len(set(onames)), "dup oracle entries"
missing = [n for n in qnames if n not in FAM_OF]
extra = [n for n in FAM_OF if n not in qnames]
if missing or extra:
    sys.exit(f"uncategorized: {missing}\nnonexistent: {extra}")
bad_oracle = [n for n in onames if n not in FAM_OF]
if bad_oracle:
    sys.exit(f"oracle without family: {bad_oracle}")
print(f"{len(qnames)} queries, {len(onames)} oracles")

HEADER = """package graft

import org.apache.spark.sql.{{DataFrame, SparkSession}}
import org.apache.spark.sql.functions._
import EntryHelpers._

/** {doc} contract queries + their DuckDB oracles, kept ADJACENT per
  * family (split from the former 5k-line SparkEntry maps — round-9
  * verdict #7: a mis-paired oracle edit was a 5k-line scroll).
  * [[SparkEntry]] aggregates every family and asserts name uniqueness. */
private[graft] object {name} {{

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
"""

DOCS = {
 "RbqlEntries": "RBQL-surface (reference §2 rows 14-43)",
 "TemporalEntries": "Event-time / sessionization / as-of",
 "ProfilingEntries": "Profiling, drift and data-quality",
 "DedupEntries": "Deduplication / similarity / decontamination",
 "TextEntries": "Text analysis, LM scoring and retrieval",
 "SamplingEntries": "Sampling, splits, mixing and classifier-filter",
 "EmbeddingEntries": "Embedding ops, ANN and layout",
}

os.makedirs(OUT, exist_ok=True)
for fam, names in FAMILIES.items():
    order = [n for n in qnames if n in names]
    qtxt = "\n".join("\n".join(b) for n, b in qblocks if n in names)
    otxt = "\n".join("\n".join(b) for n, b in oblocks if n in names)
    body = HEADER.format(doc=DOCS[fam], name=fam)
    body += qtxt + "\n  )\n\n"
    body += "  val oracles: Seq[(String, String)] = Seq(\n"
    body += otxt + "\n  )\n}\n"
    with open(f"{OUT}/{fam}.scala", "w") as f:
        f.write(body)
    print(fam, len(order), "queries,", body.count("\n"), "lines")
