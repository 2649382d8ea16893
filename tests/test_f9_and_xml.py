"""F9 feedback pipeline composition + S5 generic XML parser."""

import pytest
from pyspark.sql import functions as F

from luc4ir_spark.functions.analysis import AnalyzerConfig
from luc4ir_spark.operators import feedback as fb
from luc4ir_spark.operators import indexer as ix
from luc4ir_spark.operators import retrieval as rt
from luc4ir_spark.sources import docparsers as dp

SIMPLE = AnalyzerConfig(mode="simple")
DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry date cherry"),
    (2, "apple apple apple fig"),
    (3, "grape fig date banana"),
    (4, "cherry cherry cherry cherry"),
    (5, "apple cherry banana grape"),
]


@pytest.fixture(scope="module")
def index(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, content string")
    return ix.build_index(df, ix.IndexConfig(analyzer=SIMPLE))


def test_feedback_pipeline_rerank_mode(spark, index):
    qt = rt.queries_to_terms(spark, [("f1", "apple cherry")], SIMPLE)
    base = rt.score_queries(index, qt, k=10)
    out = fb.retrieve_with_feedback(index, qt, k=10, num_top_docs=3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    # same doc set, contiguous ranks; head (<=3) reranked by KL asc,
    # tail keeps first-pass order
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in base.collect()
    }
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    head_scores = [r["score"] for r in rows[:3]]
    assert head_scores == sorted(head_scores)  # KL ascending


def test_feedback_pipeline_expansion_mode(spark, index):
    qt = rt.queries_to_terms(spark, [("f1", "apple")], SIMPLE)
    out = fb.retrieve_with_feedback(
        index, qt, k=10, num_top_docs=3, expand=True,
        num_expansion_terms=3, fb_weight=0.3,
    )
    rows = out.collect()
    assert len(rows) > 0
    # expansion can surface docs NOT matching the original query term
    base_docs = {
        r["doc_id"]
        for r in rt.score_queries(index, qt, k=10).collect()
    }
    assert {r["doc_id"] for r in rows} >= base_docs


def test_generic_xml(spark, tmp_path):
    d = tmp_path / "xmlcoll"
    d.mkdir()
    (d / "trials.xml").write_text(
        "<root>\n"
        "<clinical_study rank='1'>\n"
        "  <nct_id>NCT001</nct_id>\n"
        "  <brief_summary>First summary <b>bold</b> text.</brief_summary>\n"
        "  <detailed_description>More detail.</detailed_description>\n"
        "</clinical_study>\n"
        "<clinical_study>\n"
        "  <nct_id>NCT002</nct_id>\n"
        "  <brief_summary>Second.</brief_summary>\n"
        "</clinical_study>\n"
        "</root>\n"
    )
    df = dp.read_generic_xml(
        spark, str(d), doc_tag="clinical_study", id_tag="nct_id",
        content_tags=("brief_summary", "detailed_description"),
    )
    rows = {r["docid"]: r["content"] for r in df.collect()}
    assert set(rows) == {"NCT001", "NCT002"}
    assert rows["NCT001"] == "First summary bold text. More detail."
    assert rows["NCT002"] == "Second."
