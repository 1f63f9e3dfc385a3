"""Edge-set similarity measures between candidate entities.

Behavior parity with the reference's pluggable similarity registry
(opentapioca/similarities.py:28-69, opentapioca/classifier.py:26-31):
string key -> similarity function over (numeric id, edge set) pairs.
"""

from __future__ import annotations


def direct_link(qid_a: int, qid_b: int, edges_a: set[int], edges_b: set[int]) -> float:
    """1 point per direction of a direct link (reference similarities.py:28-39)."""
    score = 0.0
    if qid_a == qid_b or qid_b in edges_a:
        score += 1.0
    if qid_b == qid_a or qid_a in edges_b:
        score += 1.0
    return score


def edge_ratio(qid_a: int, qid_b: int, edges_a: set[int], edges_b: set[int]) -> float:
    """Mean overlap ratio with self-links added (reference similarities.py:41-49)."""
    ea = edges_a | {qid_a}
    eb = edges_b | {qid_b}
    common = float(len(ea & eb))
    return 0.5 * (common / len(ea) + common / len(eb))


def one_step(beta: float):
    """β-damped one-step random-walk meeting probability
    (reference similarities.py:52-69)."""

    def fn(qid_a: int, qid_b: int, edges_a: set[int], edges_b: set[int]) -> float:
        common = float(len(edges_a & edges_b))
        proba = 0.0
        if qid_a == qid_b:
            proba += beta * beta
        if qid_b in edges_a:
            proba += (1 - beta) * beta / len(edges_a)
        if qid_a in edges_b:
            proba += beta * (1 - beta) / len(edges_b)
        if common:
            proba += (
                (1 - beta) * (1 - beta) * (common / len(edges_a)) * (common / len(edges_b))
            )
        return proba

    return fn


def get_similarity(name: str, beta: float = 0.85):
    """Registry lookup (reference classifier.py:26-31)."""
    if name == "direct_link":
        return direct_link
    if name == "edge_ratio":
        return edge_ratio
    if name == "one_step":
        return one_step(beta)
    raise ValueError(f"unknown similarity: {name}")
