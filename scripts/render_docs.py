"""Render the model documentation site from metadata.py — the engine-side
equivalent of the reference's dbt-docs build step
(``/root/reference/.github/workflows/build_docs.yml:31-35``: ``dbt docs
generate`` + publish of the static site).

The *content* (lineage graph, exposures, per-column docs) is the tested
data in ``spotify_tracks_spark/metadata.py``; this script is only the
rendering: one self-contained static HTML page (no JS dependencies, no
network) with per-model cards, upstream/downstream links from the lineage,
and the exposure table.

Usage: python scripts/render_docs.py [out_dir]   (default: docs/)
"""

from __future__ import annotations

import html
import sys

sys.path.insert(0, ".")

from spotify_tracks_spark.metadata import (  # noqa: E402
    EXPOSURES,
    LINEAGE,
    MODEL_DOCS,
    consumers,
)

_STYLE = """
body { font-family: sans-serif; max-width: 60rem; margin: 2rem auto; color: #222; }
.card { border: 1px solid #ccc; border-radius: 6px; padding: 1rem; margin: 1rem 0; }
.card h2 { margin-top: 0; }
table { border-collapse: collapse; width: 100%; }
td, th { border: 1px solid #ddd; padding: 0.3rem 0.6rem; text-align: left; }
.deps a { margin-right: 0.6rem; }
.muted { color: #777; }
"""


def _links(names: list[str]) -> str:
    if not names:
        return '<span class="muted">(none)</span>'
    return " ".join(f'<a href="#{html.escape(n)}">{html.escape(n)}</a>' for n in sorted(names))


def render() -> str:
    downstream = consumers()
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        "<title>spotify_tracks_spark — model docs</title>",
        f"<style>{_STYLE}</style></head><body>",
        "<h1>spotify_tracks_spark — model documentation</h1>",
        "<p>Generated from <code>spotify_tracks_spark/metadata.py</code> "
        "(lineage, exposures, and column docs are pytest-enforced against "
        "the built schemas).</p>",
    ]
    for name in LINEAGE:
        doc = MODEL_DOCS.get(name, {})
        parts.append(f'<div class="card" id="{html.escape(name)}">')
        parts.append(f"<h2>{html.escape(name)}</h2>")
        parts.append(f"<p>{html.escape(doc.get('description', ''))}</p>")
        parts.append(
            f'<p class="deps">Upstream: {_links(LINEAGE[name])}<br>'
            f"Downstream: {_links(downstream.get(name, []))}</p>"
        )
        cols = doc.get("columns", {})
        if cols:
            parts.append("<table><tr><th>column</th><th>description</th></tr>")
            for col, desc in cols.items():
                parts.append(
                    f"<tr><td><code>{html.escape(col)}</code></td>"
                    f"<td>{html.escape(desc)}</td></tr>"
                )
            parts.append("</table>")
        parts.append("</div>")
    parts.append("<h1>Exposures</h1>")
    for exp_name, exp in EXPOSURES.items():
        parts.append(f'<div class="card" id="{html.escape(exp_name)}">')
        parts.append(
            f"<h2>{html.escape(exp_name)} "
            f'<span class="muted">({html.escape(exp["type"])})</span></h2>'
        )
        parts.append(f"<p>{html.escape(exp['description'])}</p>")
        parts.append(f'<p class="deps">Reads: {_links(exp["depends_on"])}</p>')
        parts.append("</div>")
    parts.append("</body></html>")
    return "\n".join(parts)


def main() -> int:
    import os

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "docs"
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "index.html")
    with open(path, "w") as f:
        f.write(render())
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
