"""Semantic annotation stage (reference SemanticAnnotation module).

The reference prompts an LLM with sampled rows to propose clean
snake_case column names + a table title/description, extracts JSON
from the free-text reply (markdown-fence regex + recursive key search,
``json_parser.py:15-52``), validates it (exact keys, columns-is-dict,
positional remap for no-header mode, ``json_parser.py:69-93``) and
retries once on parse failure (``semantic_annotation.py:194-205``).

Spark shape: a ``mapInPandas`` stage over catalog rows — the only
executor→external-service boundary besides embedding. The default
``RuleAnnotator`` is deterministic and local (snake_case cleanup), so
pipelines and tests never need a model; a real LLM client plugs in via
``CallableAnnotator`` with the same retry-once contract.
"""

from __future__ import annotations

import json
import re
from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snake_case(col: Column | str) -> Column:
    """Deterministic snake_case normalization of a column name — the
    rule-based stand-in for the LLM's proposed clean name."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(F.trim(c))
    underscored = F.regexp_replace(lowered, r"[\s\-]+", "_")
    cleaned = F.regexp_replace(underscored, r"[^a-z0-9_]", "")
    return F.regexp_replace(cleaned, r"_+", "_")


def snake_case_sql(expr: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"lower(trim({expr})), '[\\s\\-]+', '_', 'g'), "
        "'[^a-z0-9_]', '', 'g'), '_+', '_', 'g')"
    )


def extract_json_block(raw: str) -> dict | None:
    """F9/F10: pull the first JSON object out of LLM prose — fenced
    block first, then first-brace-to-last-brace fallback."""
    fence = re.search(r"```(?:json)?\s*(\{.*?\})\s*```", raw, re.S)
    candidates = [fence.group(1)] if fence else []
    start, end = raw.find("{"), raw.rfind("}")
    if start != -1 and end > start:
        candidates.append(raw[start : end + 1])
    for cand in candidates:
        try:
            obj = json.loads(cand)
            if isinstance(obj, dict):
                return obj
        except json.JSONDecodeError:
            continue
    return None


def validate_annotation(obj: dict, expected_cols: list[str]) -> dict | None:
    """F11: require table_name/table_title/table_description/columns;
    ``columns`` must be a dict; unknown source columns are dropped and
    missing ones fall back to identity (evident intent of
    ``json_parser.py:69-93``, bug-free variant)."""
    required = {"table_name", "table_title", "table_description", "columns"}
    if not required.issubset(obj):
        return None
    cols = obj["columns"]
    if not isinstance(cols, dict):
        return None
    mapped = {c: str(cols.get(c, c)) for c in expected_cols}
    return {
        "table_name": str(obj["table_name"]),
        "table_title": str(obj["table_title"]),
        "table_description": str(obj["table_description"]),
        "columns": mapped,
    }


class RuleAnnotator:
    """Deterministic local annotator: returns well-formed JSON built
    from snake_cased names — the no-model fallback."""

    def __call__(self, table_name: str, columns: list[str], sample_md: str) -> str:
        def clean(c: str) -> str:
            # parity with snake_case/snake_case_sql: Spark trim strips
            # SPACES only and Java/RE2 \s is ASCII — Python's default
            # unicode \s (NBSP etc.) and .strip() (all whitespace)
            # would diverge on messy headers ('price\n' → 'price' here
            # vs 'price_' in the column expression)
            c = re.sub(r"[ \t\n\x0b\f\r\-]+", "_", c.strip(" ").lower(), flags=re.ASCII)
            c = re.sub(r"[^a-z0-9_]", "", c, flags=re.ASCII)
            return re.sub(r"_+", "_", c)

        return json.dumps(
            {
                "table_name": table_name,
                "table_title": table_name.replace("_", " ").title(),
                "table_description": f"Table {table_name} with {len(columns)} columns.",
                "columns": {c: clean(c) for c in columns},
            }
        )


def annotate_tables(
    catalog: DataFrame,
    annotator: Callable[[str, list[str], str], str] | None = None,
    max_retries: int = 1,
) -> DataFrame:
    """mapInPandas annotation stage over per-table catalog rows.

    Input: (table_name, columns array<string>, sample_markdown).
    Output: (table_name, table_title, table_description,
    columns map<string,string>, attempts int, ok boolean).

    Preserves the reference's retry-once-on-parse-failure contract
    (``semantic_annotation.py:194-205``); a row that still fails keeps
    identity column mapping and ok=false — the pipeline never drops a
    table because a model misbehaved.
    """
    import pandas as pd

    ann = annotator or RuleAnnotator()
    schema = (
        "table_name string, table_title string, table_description string, "
        "columns map<string,string>, attempts int, ok boolean"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                cols = list(r.columns)
                parsed, attempts = None, 0
                while parsed is None and attempts <= max_retries:
                    attempts += 1
                    # a RAISING annotator (HTTP 4xx, endpoint down past
                    # its transport retries, 200-with-garbage) must
                    # count as a failed attempt and fall through to the
                    # identity mapping — not kill the Spark stage and
                    # drop EVERY table ('the pipeline never drops a
                    # table because a model misbehaved')
                    try:
                        raw = ann(
                            r.table_name, cols,
                            getattr(r, "sample_markdown", ""),
                        )
                    except Exception:
                        continue
                    obj = extract_json_block(raw) if isinstance(raw, str) else None
                    parsed = validate_annotation(obj, cols) if obj else None
                if parsed is None:
                    parsed = {
                        "table_name": r.table_name,
                        "table_title": r.table_name,
                        "table_description": "",
                        "columns": {c: c for c in cols},
                    }
                    ok = False
                else:
                    ok = True
                rows.append(
                    (
                        parsed["table_name"],
                        parsed["table_title"],
                        parsed["table_description"],
                        parsed["columns"],
                        attempts,
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "table_name", "table_title", "table_description",
                    "columns", "attempts", "ok",
                ],
            )

    return catalog.mapInPandas(run, schema=schema)


class HttpAnnotator:
    """HTTP completion client behind the annotator interface
    ``(table_name, columns, sample_md) -> raw reply text`` — the live
    tier of the reference's LLM annotation call
    (``semantic_annotation.py:116-131``: one prompt per table, fixed
    sleep; here one request per table row inside the mapInPandas stage,
    with the retry-once-on-parse-failure contract layered above by
    ``annotate_tables``).

    POSTs ``{"prompt": ..., "model": ...}`` and expects ``{"text":
    "..."}`` — the minimal completion-endpoint shape. stdlib urllib;
    429/5xx retried with exponential backoff (transport retries are
    SEPARATE from the parse-retry above); auth via caller-supplied
    headers, never read from the environment. Prompt layout mirrors the
    reference: table name + column list + sampled rows as markdown.
    """

    def __init__(
        self,
        url: str,
        model: str = "default",
        headers: dict[str, str] | None = None,
        timeout_s: float = 60.0,
        max_retries: int = 3,
        backoff_s: float = 0.5,
    ):
        self.url = url
        self.model = model
        self.headers = dict(headers or {})
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s

    def build_prompt(
        self, table_name: str, columns: list[str], sample_md: str
    ) -> str:
        cols = ", ".join(columns)
        return (
            f"Propose clean snake_case names for table '{table_name}' "
            f"with columns [{cols}].\nSample rows:\n{sample_md}\n"
            "Reply with ONE json object: table_name, table_title, "
            "table_description, columns (original -> clean)."
        )

    def __call__(
        self, table_name: str, columns: list[str], sample_md: str
    ) -> str:
        import time
        import urllib.error
        import urllib.request

        payload = json.dumps(
            {
                "prompt": self.build_prompt(table_name, columns, sample_md),
                "model": self.model,
            }
        ).encode()
        headers = {"Content-Type": "application/json", **self.headers}
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                req = urllib.request.Request(
                    self.url, data=payload, headers=headers, method="POST"
                )
                with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                    return json.loads(r.read().decode("utf-8"))["text"]
            except urllib.error.HTTPError as e:
                if e.code == 429 or e.code >= 500:
                    last = e
                else:
                    raise
            except (urllib.error.URLError, TimeoutError) as e:
                last = e
            except (json.JSONDecodeError, KeyError, UnicodeDecodeError) as e:
                # a 200 with a garbage body (proxy error page, partial
                # read) is as transient as a 503 — retry with backoff
                # instead of bypassing the loop on the first attempt
                last = e
            if attempt < self.max_retries:
                time.sleep(self.backoff_s * (2**attempt))
        raise RuntimeError(
            f"annotation endpoint failed after {self.max_retries + 1} attempts"
        ) from last
