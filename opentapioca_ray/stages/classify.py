"""Per-document candidate classification.

Re-expression of the reference's `SimpleTagClassifier`
(opentapioca/classifier.py:14-374) as a per-document group transform:
the within-document similarity graph, feature propagation
`[F, AF, A²F, …]` hstack, linear decision function and argmax-with-
positive-threshold winner are all LOCAL to one document, so the Ray shape
is `tags_ds.groupby("doc_id").map_groups(classify_fn)` with the trained
model broadcast. Training collects the (small) design matrix to the driver
exactly like the reference does.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from opentapioca_ray.functions.similarities import get_similarity
from opentapioca_ray.state.linear import LinearModel


@dataclass
class TagRec:
    id: str
    label: str | None
    rank: float
    nb_statements: int
    nb_sitelinks: int
    edges: list[int]
    similarities: list[dict] = field(default_factory=list)
    score: float | None = None
    valid: bool | None = None


@dataclass
class MentionRec:
    doc_id: str
    phrase: str
    start: int
    end: int
    log_likelihood: float
    tags: list[TagRec]
    best_qid: str | None = None
    best_tag_label: str | None = None

    def key(self):
        return (self.start, self.end)

    def tag_key(self, qid):
        return (self.start, self.end, qid)


@dataclass
class ClassifierParams:
    """Hyperparameters (reference classifier.py:18-32).

    `score_threshold` generalizes the reference's hard-coded `argmax > 0`
    accept cut (classifier.py:310-339): a mention's best tag is kept iff
    its decision score exceeds the threshold. 0.0 IS the reference
    behavior; the NIF harness CV-tunes it on the train split only (the
    class-balanced squared-hinge boundary is systematically conservative
    on sparse gold annotations, so a small negative cut trades almost no
    precision for large recall)."""

    beta: float = 0.85
    nb_steps: int = 2
    C: float = 0.001
    max_similarity_distance: int = 100
    similarity_smoothing: float = 0.1
    similarity: str = "direct_link"
    score_threshold: float = 0.0


def mentions_from_rows(df: pd.DataFrame) -> list[MentionRec]:
    """Rebuild per-mention nested structure from flat (mention, tag) rows.

    Rows for one doc; tag order within a mention = rank desc (the tagger
    emits them that way; re-sorted here for safety after shuffles)."""
    mentions: list[MentionRec] = []
    for (start, end), grp in df.groupby(["start", "end"], sort=True):
        first = grp.iloc[0]
        tags = [
            TagRec(
                id=r.qid,
                label=r.label,
                rank=float(r.rank),
                nb_statements=int(r.nb_statements),
                nb_sitelinks=int(r.nb_sitelinks),
                edges=list(r.edges) if r.edges is not None else [],
            )
            for r in grp.itertuples()
        ]
        tags.sort(key=lambda t: -t.rank)
        mentions.append(
            MentionRec(
                doc_id=str(first.doc_id),
                phrase=str(first.phrase),
                start=int(start),
                end=int(end),
                log_likelihood=float(first.log_likelihood),
                tags=tags,
            )
        )
    return mentions


def compute_similarities(mentions: list[MentionRec], params: ClassifierParams) -> None:
    """Within-document tag-similarity graph (reference classifier.py:341-374):
    self-loop at `similarity_smoothing`, distance-decayed edge scores to tags
    of mentions within `max_similarity_distance` chars, normalized per tag to
    the probability simplex.

    With `nb_steps == 0` the propagation loop never runs and the adjacency
    is dead weight, so the O(mentions^2 x tags^2) graph build is skipped
    entirely (the hot cost of the classify path at that setting)."""
    if params.nb_steps == 0:
        return
    sim_fn = get_similarity(params.similarity, params.beta)
    maxd = params.max_similarity_distance
    for mention in mentions:
        start, end = mention.start, mention.end
        for tag in mention.tags:
            sims = [{"tag": mention.tag_key(tag.id), "score": params.similarity_smoothing}]
            qid_a = int(tag.id[1:]) if tag.id[1:].isdigit() else -1
            edges_a = set(tag.edges)
            for other in mentions:
                distance = max(start - other.end, other.start - end)
                if (other.start == start and other.end == end) or distance > maxd:
                    continue
                for other_tag in other.tags:
                    qid_b = int(other_tag.id[1:]) if other_tag.id[1:].isdigit() else -2
                    similarity = params.similarity_smoothing + sim_fn(
                        qid_a, qid_b, edges_a, set(other_tag.edges)
                    )
                    similarity *= float(maxd - distance) / maxd
                    if similarity > 0.0:
                        sims.append(
                            {"tag": other.tag_key(other_tag.id), "score": similarity}
                        )
            weight_sum = sum(s["score"] for s in sims)
            if weight_sum > 0.0:
                tag.similarities = [
                    {"tag": s["tag"], "score": s["score"] / weight_sum} for s in sims
                ]


def build_feature_matrix(mentions: list[MentionRec], nb_steps: int):
    """Base features [−ll, rank, nb_statements, nb_sitelinks, 1] +
    propagation `hstack([F, AF, A²F, …])` (reference classifier.py:262-308)."""
    feature_rows = []
    tag_key_to_idx: dict = {}
    for mention in mentions:
        for tag in mention.tags:
            tag_key_to_idx[mention.tag_key(tag.id)] = len(feature_rows)
            feature_rows.append(
                [
                    mention.log_likelihood,
                    tag.rank,
                    tag.nb_statements,
                    tag.nb_sitelinks,
                    1.0,
                ]
            )
    if not feature_rows:
        return np.zeros((0, 5 * (nb_steps + 1))), {}
    feature_array = np.asarray(feature_rows, dtype=np.float64)
    n = len(feature_array)
    adj = np.zeros((n, n))
    for mention in mentions:
        for tag in mention.tags:
            tag_idx = tag_key_to_idx[mention.tag_key(tag.id)]
            for similarity in tag.similarities:
                other_idx = tag_key_to_idx.get(similarity["tag"])
                if other_idx is None:
                    continue  # the tag was pruned
                adj[other_idx, tag_idx] = similarity["score"]
    mixed = feature_array
    parts = [feature_array]
    for _ in range(nb_steps):
        mixed = adj @ mixed
        parts.append(mixed)
    return np.hstack(parts), tag_key_to_idx


def classify_mentions(
    mentions: list[MentionRec], model: LinearModel, params: ClassifierParams
) -> None:
    """Score every tag; per mention keep argmax with score >
    params.score_threshold (reference classifier.py:310-339 keeps
    argmax > 0 — the default threshold)."""
    features, tag_key_to_idx = build_feature_matrix(mentions, params.nb_steps)
    scores = model.decision_function(features) if tag_key_to_idx else np.zeros(0)
    for mention in mentions:
        max_score = params.score_threshold
        best_tag = best_label = None
        for tag in mention.tags:
            tag.score = float(scores[tag_key_to_idx[mention.tag_key(tag.id)]])
            if tag.score > max_score:
                max_score = tag.score
                best_tag = tag.id
                best_label = tag.label
        mention.best_qid = best_tag
        mention.best_tag_label = best_label


def doc_design_matrix(
    mentions: list[MentionRec],
    gold: dict[tuple[int, int], str],
    params: ClassifierParams,
):
    """Training rows for one document: features + validity labels
    (reference classifier.py:160-208). `gold` maps (begin, end) -> qid."""
    for mention in mentions:
        gold_qid = gold.get(mention.key())
        if gold_qid is not None:
            for tag in mention.tags:
                tag.valid = tag.id == gold_qid
    features, tag_key_to_idx = build_feature_matrix(mentions, params.nb_steps)
    X, y = [], []
    for mention in mentions:
        for tag in mention.tags:
            idx = tag_key_to_idx.get(mention.tag_key(tag.id))
            if idx is not None:
                X.append(features[idx])
                y.append(int(tag.valid or False))
    return X, y


# ---------------------------------------------------------------------------
# Ray Data wrappers
# ---------------------------------------------------------------------------

RESULT_COLUMNS = [
    "doc_id",
    "start",
    "end",
    "phrase",
    "qid",
    "score",
    "is_best",
    "best_qid",
]


def classify_partition_vectorized(
    df: pd.DataFrame, model: LinearModel, params: ClassifierParams
) -> pd.DataFrame:
    """`nb_steps == 0` fast path over a whole partition: the feature matrix
    is just the 5 base columns, so scores are one matmul and the per-mention
    argmax runs as a segment reduction — no MentionRec/TagRec construction,
    no per-doc Python loop. Exactly reproduces the per-row path's winner
    tie-break: tags scanned in (rank desc, original row order) with strict
    `>`, i.e. the FIRST maximal-score tag in that order wins (equivalence
    fuzz-pinned in tests/test_classify_vectorized.py)."""
    n = len(df)
    doc = df["doc_id"].astype(str).to_numpy(dtype=object)
    start = df["start"].to_numpy(dtype=np.int64)
    end = df["end"].to_numpy(dtype=np.int64)
    rank = df["rank"].to_numpy(dtype=np.float64)
    ll = df["log_likelihood"].to_numpy(dtype=np.float64)
    phrase = df["phrase"].to_numpy(dtype=object)
    doc_code = pd.factorize(doc, sort=False)[0]
    pos = np.arange(n, dtype=np.int64)
    order = np.lexsort((pos, -rank, end, start, doc_code))
    dc, st, en = doc_code[order], start[order], end[order]
    new_seg = np.concatenate(
        ([True], (dc[1:] != dc[:-1]) | (st[1:] != st[:-1]) | (en[1:] != en[:-1]))
    )
    seg_id = np.cumsum(new_seg) - 1
    starts_idx = np.flatnonzero(new_seg)
    # the per-row path takes the MENTION's log_likelihood and phrase from
    # its first ORIGINAL row (mentions_from_rows `grp.iloc[0]`) for every
    # tag row — reproduce via the min original position per segment
    first_pos = np.minimum.reduceat(pos[order], starts_idx)
    ll_seg = ll[first_pos][seg_id]
    phrase_seg = phrase[first_pos][seg_id]
    X = np.column_stack(
        [
            ll_seg,
            rank[order],
            df["nb_statements"].to_numpy(dtype=np.float64)[order],
            df["nb_sitelinks"].to_numpy(dtype=np.float64)[order],
            np.ones(n),
        ]
    )
    sc = model.decision_function(X)
    seg_max = np.maximum.reduceat(sc, starts_idx)
    # first maximal-score row per segment in (rank desc, row order) order
    cand = np.flatnonzero(sc == seg_max[seg_id])
    _, first_of = np.unique(seg_id[cand], return_index=True)
    win_idx = cand[first_of]
    accepted = seg_max > params.score_threshold
    qid_sorted = df["qid"].to_numpy(dtype=object)[order]
    best_per_seg = np.where(accepted, qid_sorted[win_idx], None)
    best_col = best_per_seg[seg_id]
    is_best = np.zeros(n, dtype=bool)
    is_best[win_idx[accepted]] = True
    return pd.DataFrame(
        {
            "doc_id": doc[order],
            "start": st,
            "end": en,
            "phrase": phrase_seg,
            "qid": qid_sorted,
            "score": sc,
            "is_best": is_best,
            "best_qid": best_col,
        },
        columns=RESULT_COLUMNS,
    )


def design_rows_vectorized(
    df: pd.DataFrame, gold: pd.DataFrame, params: ClassifierParams
):
    """`doc_design_matrix` for a whole partition at `nb_steps == 0`:
    returns `(doc_ids, X, y)` arrays where X is the 5 base feature columns
    and y is the gold-join validity label — one left merge + column
    stacking instead of per-doc MentionRec construction. Matches the
    per-doc path's conventions exactly (mention log_likelihood taken from
    the mention's first original row; unlabeled mentions contribute y=0
    rows); equivalence fuzz-pinned in tests/test_classify_vectorized.py.

    `gold` columns: doc_id (string), begin, end, gold_qid."""
    n = len(df)
    doc = df["doc_id"].astype(str)
    ll_first = (
        df["log_likelihood"]
        .groupby([doc, df["start"], df["end"]], sort=False)
        .transform("first")
        .to_numpy(dtype=np.float64)
    )
    X = np.column_stack(
        [
            ll_first,
            df["rank"].to_numpy(dtype=np.float64),
            df["nb_statements"].to_numpy(dtype=np.float64),
            df["nb_sitelinks"].to_numpy(dtype=np.float64),
            np.ones(n),
        ]
    )
    if len(gold):
        g = gold[["doc_id", "begin", "end", "gold_qid"]].copy()
        g["doc_id"] = g["doc_id"].astype(str)
        # dict-build semantics: one gold qid per (doc, begin, end), last wins
        g = g.drop_duplicates(["doc_id", "begin", "end"], keep="last")
        merged = pd.DataFrame(
            {
                "doc_id": doc.to_numpy(dtype=object),
                "start": df["start"].to_numpy(dtype=np.int64),
                "end": df["end"].to_numpy(dtype=np.int64),
                "qid": df["qid"].to_numpy(dtype=object),
            }
        ).merge(
            g,
            left_on=["doc_id", "start", "end"],
            right_on=["doc_id", "begin", "end"],
            how="left",
        )
        y = (
            (merged["qid"] == merged["gold_qid"]).to_numpy(dtype=bool)
        ).astype(np.int64)
    else:
        y = np.zeros(n, dtype=np.int64)
    return doc.to_numpy(dtype=object), X, y


def make_classify_group_fn(model_dict: dict, params: ClassifierParams):
    """Group fn for `tags_ds.groupby('doc_id').map_groups(fn)`: one output
    row per candidate tag with its score and the mention-level winner."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        model = LinearModel.from_dict(model_dict)
        mentions = mentions_from_rows(df)
        compute_similarities(mentions, params)
        classify_mentions(mentions, model, params)
        out = []
        for m in mentions:
            for t in m.tags:
                out.append(
                    {
                        "doc_id": m.doc_id,
                        "start": m.start,
                        "end": m.end,
                        "phrase": m.phrase,
                        "qid": t.id,
                        "score": t.score,
                        "is_best": t.id == m.best_qid,
                        "best_qid": m.best_qid,
                    }
                )
        return pd.DataFrame(out, columns=RESULT_COLUMNS)

    return fn


def classify_dataset(tags_ds, model: LinearModel, params: ClassifierParams):
    """tags Dataset -> per-tag scores + per-mention winners. The model ships
    as a plain dict inside the closure (small). ONE coarse-partition
    exchange on hash(doc_id) % P (stages/exchange.py): the partition kernel
    deserializes the model once and classifies ALL its documents via a
    pandas-level groupby split — not a Ray-level per-doc `map_groups`,
    whose per-group task overhead collapses at millions of documents (the
    per-doc similarity-graph work itself is irreducibly per-document)."""
    from opentapioca_ray.stages.exchange import coarse_group_apply

    model_dict = model.to_dict()

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=RESULT_COLUMNS)
        mdl = LinearModel.from_dict(model_dict)
        if params.nb_steps == 0:
            return classify_partition_vectorized(df, mdl, params)
        outs = []
        for _, doc_df in df.groupby("doc_id", sort=False):
            mentions = mentions_from_rows(doc_df)
            compute_similarities(mentions, params)
            classify_mentions(mentions, mdl, params)
            outs.append(
                pd.DataFrame(
                    [
                        {
                            "doc_id": m.doc_id,
                            "start": m.start,
                            "end": m.end,
                            "phrase": m.phrase,
                            "qid": t.id,
                            "score": t.score,
                            "is_best": t.id == m.best_qid,
                            "best_qid": m.best_qid,
                        }
                        for m in mentions
                        for t in m.tags
                    ],
                    columns=RESULT_COLUMNS,
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(columns=RESULT_COLUMNS)

    return coarse_group_apply(tags_ds, "doc_id", partition_fn)


def evaluate_predictions(pred_best: pd.DataFrame, gold: pd.DataFrame) -> dict:
    """Micro precision/recall/F1 (reference classifier.py:221-260).

    `pred_best`: one row per mention with best_qid (may be None).
    `gold`: doc_id, begin, end, gold_qid.
    """
    merged = pred_best.merge(
        gold,
        left_on=["doc_id", "start", "end"],
        right_on=["doc_id", "begin", "end"],
        how="left",
    )
    has_pred = merged["best_qid"].notna()
    nb_predictions = int(has_pred.sum())
    nb_valid = int((merged["best_qid"] == merged["gold_qid"]).sum())
    nb_judgments = len(gold)
    precision = nb_valid / nb_predictions if nb_predictions else 1.0
    recall = nb_valid / nb_judgments if nb_judgments else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1}
