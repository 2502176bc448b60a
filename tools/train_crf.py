"""Deterministic trainer for the [N5] statistical NER layer.

Builds BIO training sequences from the 810-fixture corpus using the
repo's own rule/dictionary NER as supervision (the reference trains its
CRFNER on BioCreative/CoNLL-style data we cannot ship; self-supervision
from the rule tier is the deterministic stand-in and mirrors the
two-tier RuleNER→CRF recall design), runs a fixed-seed averaged
structured perceptron, and writes scaled-integer weights to
`reach_spark/_crf_weights.py`.

Run: python tools/train_crf.py   (regenerate after changing the fixture
corpus, the rule NER, or the feature set — guarded by FIXTURE_SHA.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = 8
SCALE = 100          # averaged weights → ints
PRUNE = 1            # drop |scaled weight| < PRUNE


def _lcg(seed: int):
    """Deterministic shuffling source (no random module state)."""
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield s


def build_examples():
    from reach_spark.extract import (SentenceExtractor, annotate_sentence,
                                     split_sentences)
    from reach_spark.fixtures import fixture_sentences
    from reach_spark.resources import entity_dictionary

    dictionary = entity_dictionary()
    examples = []
    for text in fixture_sentences():
        for sent in split_sentences(text):
            ann = annotate_sentence(sent)
            ex = SentenceExtractor("d", 0, ann, dictionary)
            ents = [m for m in ex.run() if m["kind"] == "tbm"]
            bio = ["O"] * len(ann["words"])
            # longest-first so nested spans resolve outer-first
            for m in sorted(ents, key=lambda m: m["start"] - m["end"]):
                s, e, lab = m["start"], m["end"], m["label"]
                if all(t == "O" for t in bio[s:e]):
                    bio[s] = "B-" + lab
                    for i in range(s + 1, e):
                        bio[i] = "I-" + lab
            examples.append((ann["words"], ann["tags"], bio))
    return examples


def train(examples):
    from reach_spark.crf import token_features, viterbi

    labels = sorted({t for _, _, bio in examples for t in bio})
    W: dict[str, dict[str, float]] = {}
    T: dict[str, float] = {}
    # averaging accumulators (lazy-update trick)
    Wa: dict[tuple[str, str], float] = {}
    Wt: dict[tuple[str, str], int] = {}
    Ta: dict[str, float] = {}
    Tt: dict[str, int] = {}
    step = 0

    def upd_w(f, lab, delta):
        row = W.setdefault(f, {})
        Wa[(f, lab)] = Wa.get((f, lab), 0.0) + \
            (step - Wt.get((f, lab), 0)) * row.get(lab, 0.0)
        Wt[(f, lab)] = step
        row[lab] = row.get(lab, 0.0) + delta

    def upd_t(key, delta):
        Ta[key] = Ta.get(key, 0.0) + (step - Tt.get(key, 0)) * T.get(key, 0.0)
        Tt[key] = step
        T[key] = T.get(key, 0.0) + delta

    rng = _lcg(20260818)
    order = list(range(len(examples)))
    for epoch in range(EPOCHS):
        # deterministic Fisher-Yates
        for i in range(len(order) - 1, 0, -1):
            j = next(rng) % (i + 1)
            order[i], order[j] = order[j], order[i]
        wrong = 0
        for idx in order:
            words, tags, gold = examples[idx]
            step += 1
            pred = viterbi(words, tags, W, T, labels)
            if pred == gold:
                continue
            wrong += 1
            feats = [token_features(words, tags, i)
                     for i in range(len(words))]
            for i, (g, p) in enumerate(zip(gold, pred)):
                if g != p:
                    for f in feats[i]:
                        upd_w(f, g, 1.0)
                        upd_w(f, p, -1.0)
                gp = gold[i - 1] if i else "<s>"
                pp = pred[i - 1] if i else "<s>"
                if g != p or gp != pp:
                    upd_t(gp + ">" + g, 1.0)
                    upd_t(pp + ">" + p, -1.0)
        print(f"epoch {epoch}: {wrong}/{len(examples)} sequences updated")

    # finalize averages
    Wf: dict[str, dict[str, int]] = {}
    for (f, lab), acc in Wa.items():
        cur = W.get(f, {}).get(lab, 0.0)
        avg = (acc + (step - Wt[(f, lab)]) * cur + cur) / step
        v = round(avg * SCALE)
        if abs(v) >= PRUNE:
            Wf.setdefault(f, {})[lab] = v
    Tf: dict[str, int] = {}
    for key, acc in Ta.items():
        cur = T.get(key, 0.0)
        avg = (acc + (step - Tt[key]) * cur + cur) / step
        v = round(avg * SCALE)
        if abs(v) >= PRUNE:
            Tf[key] = v
    return labels, Wf, Tf


def main():
    from gen_kg_oracle import fixture_corpus_sha

    examples = build_examples()
    print(f"{len(examples)} training sequences")
    labels, Wf, Tf = train(examples)

    # training-set accuracy with the final averaged weights
    from reach_spark.crf import viterbi
    tok = ok = seq_ok = 0
    for words, tags, gold in examples:
        pred = viterbi(words, tags, Wf, Tf, labels)
        ok += sum(1 for g, p in zip(gold, pred) if g == p)
        tok += len(gold)
        seq_ok += int(pred == gold)
    print(f"train token acc {ok}/{tok} = {ok / tok:.4f}; "
          f"seq acc {seq_ok}/{len(examples)} = "
          f"{seq_ok / len(examples):.4f}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reach_spark", "_crf_weights.py")
    n_w = sum(len(r) for r in Wf.values())
    with open(out, "w") as f:
        f.write('"""GENERATED by tools/train_crf.py — do not edit.\n\n'
                "Averaged-perceptron weights for the [N5] statistical NER\n"
                f"(scale x{SCALE}, {len(Wf)} features / {n_w} emission "
                f"weights, {len(Tf)} transitions).\n"
                '"""\n\n')
        f.write(f"FIXTURE_SHA = {fixture_corpus_sha()!r}\n\n")
        f.write(f"LABELS = {labels!r}\n\n")
        f.write("W = {\n")
        for feat in sorted(Wf):
            f.write(f"    {feat!r}: {Wf[feat]!r},\n")
        f.write("}\n\nT = {\n")
        for key in sorted(Tf):
            f.write(f"    {key!r}: {Tf[key]!r},\n")
        f.write("}\n")
    print(f"wrote {out}: {len(Wf)} features, {n_w} emission weights, "
          f"{len(Tf)} transitions")


if __name__ == "__main__":
    main()
