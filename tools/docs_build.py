"""Rendered-docs build — the Documenter.jl analogue (``make docs-html``).

The reference CI builds and deploys HTML docs with doctests
(``/root/reference/.github/workflows/CI.yml:79-86``,
``/root/reference/docs/make.jl``).  This repo's doc PAGES are already
executable specs (their code blocks run in ``tests/test_docs.py`` — stronger
than doctests); this module adds the missing build artifact: a dependency-
free Markdown→HTML renderer producing a navigable static site under
``docs/_build/`` (no pip, so no mkdocs/sphinx — the subset of Markdown the
docs actually use is rendered directly).

Supported: ATX headings, fenced code blocks, tables, ordered/unordered
lists, blockquotes, inline code/bold/italic/links, and ``.md`` cross-links
(rewritten to ``.html``).  Run: ``python tools/docs_build.py`` (or
``make docs-html``); gated by ``tests/test_docs.py::test_docs_html_build``.
"""

from __future__ import annotations

import html
import re
import sys
from pathlib import Path
from typing import List

REPO = Path(__file__).resolve().parent.parent
DOCS = REPO / "docs"
OUT = DOCS / "_build"

PAGE_ORDER = [
    "index.md",
    "signals.md",
    "inference.md",
    "compiled.md",
    "models.md",
    "scaling.md",
    "serving.md",
    "precision.md",
    "benchmarks.md",
    "native.md",
]

CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       max-width: 60rem; margin: 2rem auto; padding: 0 1rem;
       color: #1a1a1a; line-height: 1.55; }
nav { border-bottom: 1px solid #ddd; padding-bottom: .6rem;
      margin-bottom: 1.5rem; font-size: .92rem; }
nav a { margin-right: .9rem; text-decoration: none; color: #0b5fa5; }
pre { background: #f6f8fa; padding: .8rem 1rem; overflow-x: auto;
      border-radius: 6px; font-size: .88rem; }
code { background: #f1f3f5; padding: .1em .3em; border-radius: 4px;
       font-size: .9em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; font-size: .92rem; }
th, td { border: 1px solid #ccc; padding: .35rem .6rem; text-align: left; }
th { background: #f1f3f5; }
blockquote { border-left: 3px solid #bbb; margin-left: 0;
             padding-left: 1rem; color: #555; }
h1, h2, h3 { line-height: 1.25; }
"""


def _inline(text: str) -> str:
    """Inline markdown -> HTML on an escaped string."""
    text = html.escape(text, quote=False)
    # Code spans first (protect their contents from emphasis rules).
    parts = re.split(r"(`[^`]+`)", text)
    out: List[str] = []
    for part in parts:
        if part.startswith("`") and part.endswith("`") and len(part) > 2:
            out.append(f"<code>{part[1:-1]}</code>")
            continue
        part = re.sub(
            r"\[([^\]]+)\]\(([^)]+)\)",
            lambda m: '<a href="{}">{}</a>'.format(
                re.sub(r"\.md(#[\w-]*)?$", r".html\1", m.group(2)), m.group(1)
            ),
            part,
        )
        part = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", part)
        part = re.sub(r"(?<![\w*])\*([^*]+)\*(?![\w*])", r"<em>\1</em>", part)
        out.append(part)
    return "".join(out)


def render_markdown(text: str) -> str:
    lines = text.split("\n")
    out: List[str] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if line.startswith("```"):
            j = i + 1
            block: List[str] = []
            while j < n and not lines[j].startswith("```"):
                block.append(lines[j])
                j += 1
            out.append(
                "<pre><code>"
                + html.escape("\n".join(block), quote=False)
                + "</code></pre>"
            )
            i = j + 1
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", line)
        if m:
            level = len(m.group(1))
            out.append(f"<h{level}>{_inline(m.group(2))}</h{level}>")
            i += 1
            continue
        if (
            line.startswith("|")
            and i + 1 < n
            and re.match(r"^\|[\s:|-]+\|?\s*$", lines[i + 1])
        ):
            header = [c.strip() for c in line.strip().strip("|").split("|")]
            rows: List[List[str]] = []
            j = i + 2
            while j < n and lines[j].startswith("|"):
                rows.append(
                    [c.strip() for c in lines[j].strip().strip("|").split("|")]
                )
                j += 1
            out.append("<table><thead><tr>")
            out.extend(f"<th>{_inline(c)}</th>" for c in header)
            out.append("</tr></thead><tbody>")
            for row in rows:
                out.append(
                    "<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in row) + "</tr>"
                )
            out.append("</tbody></table>")
            i = j
            continue
        m = re.match(r"^(\s*)([-*]|\d+\.)\s+(.*)$", line)
        if m:
            ordered = m.group(2) not in ("-", "*")
            tag = "ol" if ordered else "ul"
            items: List[str] = []
            j = i
            while j < n:
                mi = re.match(r"^(\s*)([-*]|\d+\.)\s+(.*)$", lines[j])
                if mi and (mi.group(2) not in ("-", "*")) == ordered:
                    items.append(mi.group(3))
                    j += 1
                elif j < n and lines[j].startswith("  ") and items:
                    items[-1] += " " + lines[j].strip()  # continuation
                    j += 1
                else:
                    break
            out.append(f"<{tag}>")
            out.extend(f"<li>{_inline(it)}</li>" for it in items)
            out.append(f"</{tag}>")
            i = j
            continue
        if line.startswith(">"):
            quote: List[str] = []
            j = i
            while j < n and lines[j].startswith(">"):
                quote.append(lines[j].lstrip("> "))
                j += 1
            out.append(f"<blockquote><p>{_inline(' '.join(quote))}</p></blockquote>")
            i = j
            continue
        if not line.strip():
            i += 1
            continue
        para: List[str] = []
        j = i
        while j < n and lines[j].strip() and not re.match(
            r"^(#{1,6}\s|```|\||\s*[-*]\s|\s*\d+\.\s|>)", lines[j]
        ):
            para.append(lines[j].strip())
            j += 1
        out.append(f"<p>{_inline(' '.join(para))}</p>")
        i = j
    return "\n".join(out)


def _title_of(md: Path) -> str:
    for line in md.read_text().split("\n"):
        m = re.match(r"^#\s+(.*)$", line)
        if m:
            return re.sub(r"[#`*]", "", m.group(1)).strip()
    return md.stem


def build() -> Path:
    OUT.mkdir(exist_ok=True)
    pages = [p for p in PAGE_ORDER if (DOCS / p).exists()]
    pages += sorted(
        p.name
        for p in DOCS.glob("*.md")
        if p.name not in PAGE_ORDER
    )
    nav = "".join(
        '<a href="{}">{}</a>'.format(
            p.replace(".md", ".html"), html.escape(_title_of(DOCS / p))
        )
        for p in pages
    )
    (OUT / "style.css").write_text(CSS)
    for name in pages:
        body = render_markdown((DOCS / name).read_text())
        title = html.escape(_title_of(DOCS / name))
        (OUT / name.replace(".md", ".html")).write_text(
            "<!DOCTYPE html><html><head><meta charset='utf-8'>"
            f"<title>{title} — cortex_tpu</title>"
            "<link rel='stylesheet' href='style.css'></head><body>"
            f"<nav>{nav}</nav>\n{body}\n</body></html>"
        )
    return OUT


if __name__ == "__main__":
    out = build()
    print(f"rendered {len(list(out.glob('*.html')))} pages -> {out}", file=sys.stderr)
