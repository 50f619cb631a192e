"""Raw-document extraction (r12 — operators/extraction.py): structural
HTML→text, entity decoding, and frequency-based boilerplate-line
removal.  The oracle gate covers the fixture round trip end-to-end;
these tests pin the operator semantics on handcrafted markup (the
cases the synthesized fixture can't isolate) and the plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_practice_spark.operators.extraction import (
    drop_boilerplate_lines,
    extract_title,
    html_to_text,
)


def _one(spark, s: str, expr) -> str:
    return spark.createDataFrame([(s,)], "h string").select(
        expr(F.col("h")).alias("o")
    ).first().o


def test_html_to_text_strips_blocks_and_tags(spark):
    h = (
        "<html><head><title>T</title><style>p { color: red; }</style>"
        "<script>if (1 < 2 && 3 > 2) { x('&amp;'); }</script></head>"
        "<body><nav>a | b</nav><header>site</header>"
        "<!-- hidden < comment -->"
        "<div><h1>Head</h1><p>body   text</p></div>"
        "<footer>foot</footer></body></html>"
    )
    assert _one(spark, h, html_to_text) == "Head body text"
    assert _one(spark, h, extract_title) == "T"


def test_html_to_text_case_insensitive_blocks_and_attrs(spark):
    h = '<SCRIPT type="text/js">payload</SCRIPT><P>keep</P>'
    assert _one(spark, h, html_to_text) == "keep"
    h2 = '<NaV class="x">menu</nAv>content'
    assert _one(spark, h2, html_to_text) == "content"


def test_entity_decode_order_and_injection(spark):
    # &amp; decodes LAST: "&amp;lt;" is the literal text "&lt;", not "<"
    assert _one(spark, "a &amp;lt; b", html_to_text) == "a &lt; b"
    # entities decode AFTER tag stripping: entity-encoded markup is
    # CONTENT, not structure — decoding first would let a page smuggle
    # a "script block" past the stripper (or strip user text as a tag)
    h = "&lt;script&gt;x&lt;/script&gt;"
    assert _one(spark, h, html_to_text) == "<script>x</script>"
    # the full named + numeric set
    assert (
        _one(spark, "&quot;q&quot; &#39;s&#39; a&nbsp;b &#105;", html_to_text)
        == "\"q\" 's' a b i"
    )


def test_html_to_text_multiline_blocks(spark):
    h = "<style>\nbody {\n margin: 0;\n}\n</style>one\n\n  two"
    assert _one(spark, h, html_to_text) == "one two"


def test_drop_boilerplate_lines_threshold_and_min_docs(spark):
    rows = []
    # source A: 10 docs; "banner" in all 10 (df=1.0 → dropped),
    # "promo" in 5 (df=0.5 < 0.6 → kept), unique body lines kept
    for d in range(10):
        rows.append((d, "A", 0, "banner"))
        rows.append((d, "A", 1, f"body-{d}"))
        if d < 5:
            rows.append((d, "A", 2, "promo"))
    # source B: ONE doc — min_docs guard keeps everything, even though
    # its single line trivially has df=1.0
    rows.append((99, "B", 0, "only line"))
    lines = spark.createDataFrame(
        rows, "doc_id long, source string, line_no int, line string"
    )
    kept = drop_boilerplate_lines(lines, min_docs=2, df_threshold=0.6)
    got = {(r.doc_id, r.line) for r in kept.collect()}
    assert ("banner" not in {l for _d, l in got})
    assert {(d, "promo") for d in range(5)} <= got
    assert {(d, f"body-{d}") for d in range(10)} <= got
    assert (99, "only line") in got
    # exactly at the threshold is boilerplate (>= rule): 6 of 10 docs
    lines2 = lines.union(
        spark.createDataFrame(
            [(d, "A", 3, "edge") for d in range(6)],
            "doc_id long, source string, line_no int, line string",
        )
    )
    kept2 = {
        (r.doc_id, r.line)
        for r in drop_boilerplate_lines(lines2, 2, 0.6).collect()
    }
    assert "edge" not in {l for _d, l in kept2}


def test_extract_html_plan_is_one_codegen_scan(spark, sf_dir):
    """Structural extraction must stay a single shuffle-free codegen
    projection over one corpus scan — the property that makes it
    scan-speed at 100 TB."""
    from cdc_practice_spark.queries.pipeline_queries import corpus_extract_html

    df = corpus_extract_html(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # orderBy adds the final presentation sort; the extraction itself
    # must contribute no Exchange beyond it
    assert plan.count("Exchange") <= 1, plan
    assert "BatchScan" in plan or "FileScan" in plan or "Scan parquet" in plan
