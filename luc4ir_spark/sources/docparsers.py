"""Corpus ingestion parsers: raw collection files -> document rows.

Distributed re-expressions of the reference's per-file parser dispatch
(reference: indexing/TrecDocIndexer.java:238-353):

- TREC SGML files: many ``<DOC>...<DOCNO>id</DOCNO>...text...</DOC>``
  blocks per file (reference DOM parse at TrecDocIndexer.java:328-353)
- annotated-line format: doc id on a ``<pno>`` line, text accumulated
  until ``</p>`` (reference: TrecDocIndexer.java:281-313)
- TSV ``docid \\t text`` lines (reference: TrecDocIndexer.java:259-279)
- ``.tar.gz`` archives of document files (reference:
  TrecDocIndexer.java:104-134)
- gzip members are handled natively by Spark's text source
  (reference sniffs by extension at TrecDocIndexer.java:241-243)

All file-level parsers read whole files through the ``binaryFile``
source and split inside an Arrow kernel — each file is one row, so a
million-file corpus is a million-row DataFrame, partitioned by
Catalyst's file listing; no driver-side iteration.
"""

from __future__ import annotations

import gzip
import io
import re
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_RE = re.compile(rb"<DOC>(.*?)</DOC>", re.S)
DOCNO_RE = re.compile(rb"<DOCNO>\s*(.*?)\s*</DOCNO>", re.S)
TAG_RE = re.compile(rb"<[^>]+>")

OUT_SCHEMA = "docid string, content string, source_file string"


def _parse_trec_sgml(data: bytes, fname: str) -> list[tuple[str, str, str]]:
    out = []
    for m in DOC_RE.finditer(data):
        block = m.group(1)
        idm = DOCNO_RE.search(block)
        if not idm:
            continue
        docid = idm.group(1).decode("utf-8", "replace")
        body = DOCNO_RE.sub(b" ", block)
        text = TAG_RE.sub(b" ", body).decode("utf-8", "replace")
        out.append((docid, re.sub(r"\s+", " ", text).strip(), fname))
    return out


def _maybe_gunzip(name: str, data: bytes) -> bytes:
    if name.endswith(".gz") and not name.endswith(".tar.gz"):
        return gzip.decompress(data)
    return data


def read_trec_sgml(spark: SparkSession, path: str) -> DataFrame:
    """Directory (recursive) of TREC SGML files (.gz transparent) ->
    (docid, content, source_file)."""
    from ..deploy import ensure_package_on_executors

    ensure_package_on_executors(spark)
    files = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    ).load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, str]] = []
            for fname, data in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    _parse_trec_sgml(_maybe_gunzip(fname, bytes(data)), fname)
                )
            yield pd.DataFrame(
                rows, columns=["docid", "content", "source_file"]
            )

    return files.mapInPandas(parse, OUT_SCHEMA)


def read_tar_gz(spark: SparkSession, path: str) -> DataFrame:
    """``.tar.gz`` archives -> one doc per member file, TREC SGML
    members parsed, others taken verbatim (dotfiles skipped, as the
    reference does at TrecDocIndexer.java:110-116)."""
    from ..deploy import ensure_package_on_executors

    ensure_package_on_executors(spark)
    files = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    ).load(path).filter(F.col("path").endswith(".tar.gz")).select(
        "path", "content"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, str]] = []
            for fname, data in zip(pdf["path"], pdf["content"]):
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(data)), mode="r:gz"
                ) as tf:
                    for member in tf.getmembers():
                        base = member.name.rsplit("/", 1)[-1]
                        if not member.isfile() or base.startswith("."):
                            continue
                        payload = tf.extractfile(member).read()
                        if b"<DOC>" in payload:
                            rows.extend(
                                _parse_trec_sgml(
                                    payload, f"{fname}!{member.name}"
                                )
                            )
                        else:
                            rows.append(
                                (
                                    member.name,
                                    payload.decode("utf-8", "replace"),
                                    fname,
                                )
                            )
            yield pd.DataFrame(
                rows, columns=["docid", "content", "source_file"]
            )

    return files.mapInPandas(parse, OUT_SCHEMA)


def read_annotated_lines(spark: SparkSession, path: str) -> DataFrame:
    """Annotated-line corpora: ``<pno>ID</pno>`` starts a doc, lines
    accumulate until ``</p>`` (reference: TrecDocIndexer.java:281-313).
    Whole-file parse (docs cannot straddle files)."""
    from ..deploy import ensure_package_on_executors

    ensure_package_on_executors(spark)
    files = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    ).load(path).select("path", "content")
    pno = re.compile(r"<pno>\s*(.*?)\s*</pno>", re.S)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, str]] = []
            for fname, data in zip(pdf["path"], pdf["content"]):
                text = _maybe_gunzip(fname, bytes(data)).decode(
                    "utf-8", "replace"
                )
                docid, buf = None, []
                for line in text.splitlines():
                    m = pno.search(line)
                    if m:
                        docid = m.group(1)
                        buf = []
                    elif "</p>" in line:
                        if docid is not None:
                            body = re.sub(
                                r"<[^>]+>", " ",
                                " ".join(buf + [line.replace("</p>", " ")]),
                            )
                            rows.append(
                                (docid, re.sub(r"\s+", " ", body).strip(), fname)
                            )
                        docid, buf = None, []
                    elif docid is not None:
                        buf.append(line)
            yield pd.DataFrame(
                rows, columns=["docid", "content", "source_file"]
            )

    return files.mapInPandas(parse, OUT_SCHEMA)


def read_generic_xml(
    spark: SparkSession,
    path: str,
    doc_tag: str = "doc",
    id_tag: str = "docno",
    content_tags: tuple[str, ...] = ("text",),
) -> DataFrame:
    """S5: configurable-tag XML corpora (reference:
    indexing/GenericSAXParserHandler.java:84-145, properties
    sax.docstart / sax.docid / sax.content_tags): each ``doc_tag``
    element is a document, id from ``id_tag``, content concatenated
    from ``content_tags`` in document order."""
    from ..deploy import ensure_package_on_executors

    ensure_package_on_executors(spark)
    files = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    ).load(path).select("path", "content")
    doc_re = re.compile(
        rf"<{doc_tag}[\s>].*?</{doc_tag}>".encode(), re.S | re.I
    )
    id_re = re.compile(
        rf"<{id_tag}[^>]*>\s*(.*?)\s*</{id_tag}>".encode(), re.S | re.I
    )
    content_res = [
        re.compile(rf"<{t}[^>]*>(.*?)</{t}>".encode(), re.S | re.I)
        for t in content_tags
    ]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, str]] = []
            for fname, data in zip(pdf["path"], pdf["content"]):
                blob = _maybe_gunzip(fname, bytes(data))
                for m in doc_re.finditer(blob):
                    block = m.group(0)
                    idm = id_re.search(block)
                    if not idm:
                        continue
                    parts = []
                    for cre in content_res:
                        for cm in cre.finditer(block):
                            parts.append(
                                TAG_RE.sub(b" ", cm.group(1)).decode(
                                    "utf-8", "replace"
                                )
                            )
                    text = re.sub(r"\s+", " ", " ".join(parts)).strip()
                    rows.append(
                        (idm.group(1).decode("utf-8", "replace"), text, fname)
                    )
            yield pd.DataFrame(
                rows, columns=["docid", "content", "source_file"]
            )

    return files.mapInPandas(parse, OUT_SCHEMA)


def read_tsv_docs(spark: SparkSession, path: str) -> DataFrame:
    """``docid \\t text`` one doc per line (reference:
    TrecDocIndexer.java:259-279) — native distributed CSV read."""
    return (
        spark.read.option("sep", "\t")
        .schema("docid string, content string")
        .csv(path)
        .withColumn("source_file", F.input_file_name())
    )
