"""Producer entry point (reference parity: `python -m src.producer`,
/root/reference/src/producer/__main__.py).

Emits JSON-array batch files with configurable fault injection:

    python -m spark_streaming_practicum_spark.producer_cli \\
        --out /data/in --batches 10 --batch-size 100 \\
        --invalid-schema-chance 0.1 --corruption-chance 0.1 \\
        --duplicate-chance 0.0 --seed 42 \\
        [--sleep-between-batches-seconds 10]
"""

from __future__ import annotations

import argparse
import time

from .producer import BatchSerializer, EventFactory, LocalDirSink, StdoutSink


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None, help="output dir; omit for stdout")
    p.add_argument("--batches", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--invalid-schema-chance", type=float, default=0.0)
    p.add_argument("--duplicate-chance", type=float, default=0.0)
    p.add_argument("--corruption-chance", type=float, default=0.0)
    p.add_argument("--sleep-between-batches-seconds", type=float, default=0.0)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    factory = EventFactory(
        seed=args.seed,
        invalid_schema_chance=args.invalid_schema_chance,
        duplicate_chance=args.duplicate_chance,
    )
    serializer = BatchSerializer(corruption_chance=args.corruption_chance, seed=args.seed + 1)
    sink = LocalDirSink(args.out, seed=args.seed + 2) if args.out else StdoutSink()
    for _ in range(args.batches):
        sink.write(serializer.serialize(list(factory.create_random_events(args.batch_size))))
        if args.sleep_between_batches_seconds:
            time.sleep(args.sleep_between_batches_seconds)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
