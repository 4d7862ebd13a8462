"""Deterministic transcript-corpus synthesizer (FIXTURES.md §1).

Generates the exact ``BASELINE.json.input_hint`` schema:
``(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)`` with:

- scale-free-ish conversation sizes (1–200 turns) → naturally skewed
  partitions,
- a Zipf-skewed tool vocabulary (first tool ≈ 40% of tool rows) →
  exercises salting / AQE skew handling,
- planted payloads (entity aliases, noisy ``[[wikilink]]`` mentions,
  ``X depends on Y`` cues, ``{{template|k=v}}`` invocations) recorded
  as golden triples,
- fixed epoch 2024-01-01T00:00:00 + seeded monotone per-conversation
  timestamp increments — **no wall-clock, no unseeded randomness**.

The generator intentionally emits rows in shuffled order so tests
prove the stable ``(conv_id, turn_idx)`` ordering window, not
insertion order.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from lexicator_spark import rules

EPOCH = datetime(2024, 1, 1, 0, 0, 0)

FILLER = (
    "please summarize the previous result and continue with the plan "
    "we should verify the output before moving on the data looks fine "
    "let me check the logs for errors and retry the failed step again"
).split()

_ALL_ALIASES: list[str] = [a for forms in rules.ENTITY_ALIASES.values() for a in forms]


def _noisy_variant(rng: random.Random, alias: str) -> str:
    """Single-character substitution in a middle position, preserving
    the first character and total length (so the blocking key — first
    char + len//4 bucket — still hits, but exact alias matching does
    not).  Deterministic given the rng state."""
    norm = rules.normalize_surface(alias)
    if len(norm) < 4:
        return norm
    i = rng.randrange(1, len(norm) - 1)
    repl = rng.choice("abcdefghijklmnopqrstuvwxyz".replace(norm[i], "a"))
    return norm[:i] + repl + norm[i + 1 :]


@dataclass
class Corpus:
    """Rows in input_hint order + the generator-side golden triples
    (the planted payloads; the oracle recomputes them from text)."""

    rows: list[tuple]  # (conv_id, turn_idx, role, text, tool, ts)
    golden: set = field(default_factory=set)  # {(subj, pred, obj)}

    @property
    def schema_ddl(self) -> str:
        return (
            "conv_id string, turn_idx int, role string, "
            "text string, tool string, ts timestamp"
        )


def make_corpus(n_convs: int = 100, seed: int = 42, shuffled: bool = True) -> Corpus:
    rng = random.Random(seed)
    rows: list[tuple] = []
    golden: set = set()

    for conv in range(n_convs):
        conv_id = f"c{conv:06d}"
        # scale-free-ish sizes: mostly short, heavy tail to 200
        n_turns = min(200, max(1, int(rng.paretovariate(1.3))))
        ts = EPOCH + timedelta(seconds=rng.randrange(0, 86_400 * 30))
        for turn_idx in range(n_turns):
            ts += timedelta(seconds=rng.randrange(1, 120))
            uri = rules.turn_uri(conv_id, turn_idx)

            # role cycle with seeded noise; tool rows interspersed
            r = rng.random()
            if r < 0.15:
                role = "tool"
            elif turn_idx % 2 == 0:
                role = "user"
            else:
                role = "assistant"

            tool = None
            if role == "tool":
                # Zipf-ish: first tool hot (~40%)
                tool = (
                    rules.TOOL_VOCAB[0]
                    if rng.random() < 0.4
                    else rng.choice(rules.TOOL_VOCAB[1:])
                )
                golden.add((uri, rules.PRED_USES_TOOL, tool))

            words = rng.choices(FILLER, k=rng.randrange(4, 14))

            # planted exact-alias mention(s)
            if rng.random() < 0.5:
                alias = rng.choice(_ALL_ALIASES)
                words.insert(rng.randrange(len(words) + 1), alias)
                golden.add((uri, rules.PRED_MENTIONS, rules.normalize_surface(alias)))

            # planted noisy wikilink mention (fuzzy-link target)
            if rng.random() < 0.15:
                base = rng.choice(_ALL_ALIASES)
                noisy = _noisy_variant(rng, base)
                words.insert(rng.randrange(len(words) + 1), f"[[{noisy}]]")
                golden.add((uri, rules.PRED_MENTIONS, rules.normalize_surface(noisy)))

            # planted relation cue "A depends on B"
            if rng.random() < 0.12:
                a, b = rng.sample(_ALL_ALIASES, 2)
                words.append(f"{a} depends on {b}")
                golden.add(
                    (
                        rules.normalize_surface(a),
                        rules.PRED_DEPENDS_ON,
                        rules.normalize_surface(b),
                    )
                )
                # the cue also surfaces both mentions
                golden.add((uri, rules.PRED_MENTIONS, rules.normalize_surface(a)))
                golden.add((uri, rules.PRED_MENTIONS, rules.normalize_surface(b)))

            # planted template invocation {{name|k=v}}
            if rng.random() < 0.1:
                tname = rng.choice(rules.TOOL_VOCAB)
                k = rng.randrange(0, 100)
                words.append(f"{{{{{tname}|arg={k}|mode=fast}}}}")
                golden.add((uri, rules.PRED_INVOKES, tname))
                golden.add((uri, rules.PRED_TPL_PARAM, f"{tname}|arg={k}"))
                golden.add((uri, rules.PRED_TPL_PARAM, f"{tname}|mode=fast"))

            if turn_idx > 0:
                golden.add(
                    (uri, rules.PRED_REPLIES_TO, rules.turn_uri(conv_id, turn_idx - 1))
                )

            rows.append((conv_id, turn_idx, role, " ".join(words), tool, ts))

    if shuffled:
        rng.shuffle(rows)
    return Corpus(rows=rows, golden=golden)


def corpus_to_pandas(corpus: Corpus):
    import pandas as pd

    return pd.DataFrame(
        corpus.rows,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    ).astype({"turn_idx": "int32"})


def corpus_df(spark, corpus: Corpus):
    """Arrow-path conversion into a Spark DataFrame with the declared
    input_hint schema (no inference)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    return spark.createDataFrame(corpus_to_pandas(corpus), schema=schema)


def write_corpus_parquet(spark, out_dir: str, n_convs: int, seed: int = 42,
                         chunk_convs: int = 20_000) -> int:
    """Generate a large corpus in chunks and write it as parquet for
    bench runs (generation is excluded from timed sections).  Returns
    total rows written."""
    total = 0
    mode = "overwrite"
    for start in range(0, n_convs, chunk_convs):
        n = min(chunk_convs, n_convs - start)
        # distinct seed per chunk, derived deterministically
        corpus = make_corpus(n_convs=n, seed=seed + start, shuffled=False)
        # re-prefix conv ids so chunks don't collide
        rows = [
            (f"c{start:06d}_{r[0]}",) + r[1:] for r in corpus.rows
        ]
        corpus.rows = rows
        df = corpus_df(spark, corpus)
        df.repartition(32).write.mode(mode).parquet(out_dir)
        mode = "append"
        total += len(rows)
    return total
