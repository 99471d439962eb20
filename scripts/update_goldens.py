"""Regenerate golden outputs from the NumPy ORACLE (never from the
engine — the point is an engine-independent ground truth, the
verify_isomorphism.sh --update pattern, scripts/verify_isomorphism.sh:84-88).

Usage: PYTHONPATH=. python scripts/update_goldens.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xf_spark.oracle import OracleIndex
from xf_spark.transcripts import generate_transcripts_pdf

SCALE = 0.001
QUERIES = [
    ("lexical_machine", "machine", 20),
    ("lexical_rust", "rust", 20),
    ("phrase_ml", '"machine learning"', 20),
    ("bool_and", "rust AND async", 20),
    ("bool_not", "python NOT snake", 20),
    ("prefix", "progr*", 20),
    ("semantic_stress", None, 20),  # semantic path
    ("hybrid_rust", None, 20),      # hybrid path
]


def main():
    pdf = generate_transcripts_pdf(SCALE)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rows = list(pdf.itertuples())
    docs = [(i, r.text) for i, r in enumerate(rows)]
    key = {i: (r.conv_id, int(r.turn_idx)) for i, r in enumerate(rows)}
    texts = {i: r.text for i, r in enumerate(rows)}
    ix = OracleIndex.build(docs)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures", "golden")
    os.makedirs(out_dir, exist_ok=True)

    def dump(name, hits):
        data = [
            {
                "doc_id": list(key[d]),
                "score": round(float(s), 6),
                "text": texts[d],
            }
            for d, s in hits
        ]
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(data, f, indent=1, ensure_ascii=False)
        print(f"{name}: {len(data)} rows")

    for name, q, k in QUERIES:
        if name == "semantic_stress":
            dump(name, ix.semantic_topk("stress", texts, limit=k))
        elif name == "hybrid_rust":
            lex = ix.search("rust", limit=3 * k)
            sem = ix.semantic_topk("rust", texts, limit=3 * k)
            dump(name, ix.rrf_fuse(lex, sem, limit=k))
        else:
            dump(name, ix.search(q, limit=k))


if __name__ == "__main__":
    main()
