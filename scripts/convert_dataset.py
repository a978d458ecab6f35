#!/usr/bin/env python
"""spark-submit entry point for the R1 -> R2 dataset conversion.

The Spark-first counterpart of the reference's
``convert_dataset_to_squad.py`` CLI (reference: data/
convert_dataset_to_squad.py:105-383): reads raw JSON (or .tar/.tar.gz)
document datasets, converts each to SQuAD-format QA data via the
parity-pinned ``documents_to_qa_windows`` lineage, and writes train /
valid / test JSON.  Same knobs, same semantics:

  - valid/test sets (when given) convert with choose_question='first'
    and the full forced-N/A universe;
  - the train set converts with --train-choose-question and forces N/A
    qas only under --train-force-qa;
  - with no valid file and 0 < --valid-percent < 1, the train documents
    split into train/valid (and the valid split doubles as test when no
    test file is given), mirroring the reference's train_test_split
    branch.  DEVIATION (documented): the split is a deterministic
    per-document hash on doc_id instead of sklearn's seeded global
    shuffle — restart-stable, cluster-deterministic, and independent of
    row order, which a distributed conversion needs; the reference's
    random_state=42 permutation is driver-order-dependent and not
    reproducible engine-portably.

Outputs are JSON-lines (one SQuAD document per line — the
distributed-friendly layout; sources/squad.read_squad_jsonl reads them
back).  The window mode follows --context-content: 'windows' (char
budget) or 'windows_token' (token budget; pass --tokenizer-name to use a
real HuggingFace tokenizer, else the deterministic regex tokenizer).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def split_train_valid(documents, valid_percent: float, salt: str = "split"):
    """Deterministic hash split (see module docstring for the deviation
    from the reference's sklearn shuffle-split)."""
    bucket = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(salt)), F.lit(1000))
    is_valid = bucket < int(valid_percent * 1000)
    return documents.filter(~is_valid), documents.filter(is_valid)


def convert_split(documents, args, choose: str, force_qa: bool):
    from information_extraction_t5_spark.core.registry import (
        DEFAULT_PREDICATES,
        all_qa_ids,
    )
    from information_extraction_t5_spark.core.windows import WindowSpec
    from information_extraction_t5_spark.sources.convert import (
        LARGEST_QUESTION,
        documents_to_qa_windows,
    )

    known = {p.qa_id for p in DEFAULT_PREDICATES}
    type_names = [t for t in args.type_names if t in known]
    return documents_to_qa_windows(
        documents,
        spec=WindowSpec(
            max_size=args.max_size,
            window_overlap=args.window_overlap,
            max_windows=args.max_windows,
            question=LARGEST_QUESTION,
            use_sentence_id=args.use_sentence_id,
        ),
        mode=args.context_content,
        type_names=type_names,
        all_qa_ids=all_qa_ids(project=args.project) if force_qa else [],
        choose=choose,
        project=args.project,
        max_tokens=args.max_seq_length,
        tokenizer_name=args.tokenizer_name or None,
    )


def main(argv=None):
    ap = argparse.ArgumentParser("Preparing data for QA (SQuAD format)")
    ap.add_argument("--project", default="form")
    ap.add_argument("--raw-data-file", required=True,
                    help="raw train dataset (JSON or .tar/.tar.gz)")
    ap.add_argument("--raw-valid-data-file", default=None)
    ap.add_argument("--raw-test-data-file", default=None)
    ap.add_argument("--train-file", default="data/interim/train-v0.1.json")
    ap.add_argument("--valid-file", default="data/interim/dev-v0.1.json")
    ap.add_argument("--test-file", default="data/interim/test-v0.1.json")
    ap.add_argument("--type-names", nargs="+",
                    default=[])
    ap.add_argument("--valid-percent", type=float, default=0.2)
    ap.add_argument("--max-size", type=int, default=2048)
    ap.add_argument("--context-content", default="windows",
                    choices=["windows", "windows_token"])
    ap.add_argument("--train-choose-question", default="first",
                    choices=["first", "random", "all"])
    ap.add_argument("--train-force-qa", action="store_true")
    ap.add_argument("--max-seq-length", type=int, default=512)
    ap.add_argument("--window-overlap", type=float, default=0.2)
    ap.add_argument("--max-windows", type=int, default=3)
    ap.add_argument("--use-sentence-id", action="store_true")
    ap.add_argument("--tokenizer-name", default="")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("convert-dataset").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from information_extraction_t5_spark.core.registry import (
        DEFAULT_PREDICATES,
    )
    from information_extraction_t5_spark.sources.raw_json import (
        read_raw_documents,
    )
    from information_extraction_t5_spark.sources.squad import (
        write_squad_json,
    )

    if not args.type_names:
        args.type_names = [p.qa_id for p in DEFAULT_PREDICATES]

    train_docs = read_raw_documents(spark, args.raw_data_file)

    if args.raw_valid_data_file:
        valid_docs = read_raw_documents(spark, args.raw_valid_data_file)
        test_docs = (read_raw_documents(spark, args.raw_test_data_file)
                     if args.raw_test_data_file else None)
    elif 0 < args.valid_percent < 1.0:
        train_docs, valid_docs = split_train_valid(
            train_docs, args.valid_percent
        )
        test_docs = (read_raw_documents(spark, args.raw_test_data_file)
                     if args.raw_test_data_file else valid_docs)
    else:
        valid_docs, test_docs = None, None

    counters = {}
    for name, docs, choose, force in (
        ("train", train_docs, args.train_choose_question,
         args.train_force_qa),
        ("valid", valid_docs, "first", True),
        ("test", test_docs, "first", True),
    ):
        if docs is None:
            continue
        qa = convert_split(docs, args, choose, force)
        out = {"train": args.train_file, "valid": args.valid_file,
               "test": args.test_file}[name]
        write_squad_json(qa, out)
        counters[name] = qa.count()
        print(f"{name} dataset has {counters[name]} question-answers")
    return counters


if __name__ == "__main__":
    main()
