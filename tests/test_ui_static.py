"""Static consistency checks for the web UI (fast regex nets).

Since round 4 the frontend also EXECUTES in CI via the in-repo JS engine
(tests/test_ui_exec.py, clearcam_tpu/jsengine) — these cheaper checks stay
as a first line that pins the HTML/JS/server contracts directly:

- every DOM id the script references must be declared somewhere in the
  markup (including ids minted inside template literals);
- every URL the script fetches must resolve to a real handler in
  server/http.py's attribute-dispatch routing (reference endpoints,
  clearcam.py:680-1156);
- the <script> blocks must be brace/paren/bracket balanced outside of
  strings, template literals, and comments (catches truncated edits).
"""
import re
from pathlib import Path

import pytest

WEB = Path(__file__).resolve().parent.parent / "clearcam_tpu" / "server" / "web"
HTTP_SRC = (WEB.parent / "http.py").read_text()
PAGES = sorted(WEB.glob("*.html"))


def _ids_declared(text: str) -> set[str]:
    return set(re.findall(r'id="([^"]+)"', text))


def _ids_referenced(text: str) -> set[str]:
    refs = set(re.findall(r"\$\('([^']+)'\)", text))
    refs |= set(re.findall(r"getElementById\('([^']+)'\)", text))
    refs |= set(re.findall(r"querySelector(?:All)?\('#([A-Za-z_][\w-]*)", text))
    return refs


@pytest.mark.parametrize("page", PAGES, ids=lambda p: p.name)
def test_dom_id_references_resolve(page):
    text = page.read_text()
    declared = _ids_declared(text)
    for ref in _ids_referenced(text):
        if "${" in ref:  # dynamic id: the same template must mint it
            assert f'id="{ref}"' in text, f"{page.name}: no element mints {ref}"
        else:
            assert ref in declared, f"{page.name}: #{ref} referenced but never declared"


def _routes_fetched(text: str) -> set[str]:
    # fetch('/x'...), fetch(`/x...`), jget('/x'...), jget(`/x...`)
    paths = re.findall(r"(?:fetch|jget)\((?:'|`)(/[A-Za-z_0-9-]+)", text)
    # location/href navigations that hit server routes with a query string
    paths += re.findall(r"(?:href|location(?:\.href)?)\s*=\s*(?:'|`)(/[A-Za-z_0-9-]+)\?", text)
    return set(paths)


def _handler_exists(path: str) -> bool:
    name = path.strip("/").replace("-", "_").replace("/", "_")
    return f"def _get_{name}" in HTTP_SRC or f"def _post_{name}" in HTTP_SRC


@pytest.mark.parametrize("page", PAGES, ids=lambda p: p.name)
def test_fetched_routes_have_handlers(page):
    for path in _routes_fetched(page.read_text()):
        assert _handler_exists(path), f"{page.name}: {path} has no server handler"
    # and the pages actually exercise the API (guard the regexes themselves)
    assert _routes_fetched(page.read_text()), f"{page.name}: route extraction found nothing"


def _script_blocks(text: str) -> list[str]:
    return re.findall(r"<script[^>]*>(.*?)</script>", text, re.S)


def _balance(js: str, fname: str):
    """Brace/paren/bracket balance outside strings, templates and comments.

    The UI uses no JS regex literals (checked at authoring time), so a
    string/comment-aware scan is exact for these files.
    """
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    i, n = 0, len(js)
    mode = None  # None | "'" | '"' | '`' | '//' | '/*'
    while i < n:
        c = js[i]
        nxt = js[i + 1] if i + 1 < n else ""
        if mode is None:
            if c in "'\"`":
                mode = c
            elif c == "/" and nxt == "/":
                mode, i = "//", i + 1
            elif c == "/" and nxt == "*":
                mode, i = "/*", i + 1
            elif c in "([{":
                stack.append((c, i))
            elif c in ")]}":
                assert stack and stack[-1][0] == pairs[c], \
                    f"{fname}: unbalanced {c!r} at script offset {i}"
                stack.pop()
        elif mode in "'\"":
            if c == "\\":
                i += 1
            elif c == mode or c == "\n":
                mode = None
        elif mode == "`":
            if c == "\\":
                i += 1
            elif c == "$" and nxt == "{":
                # template interpolation: scan it as code until its brace closes
                depth, i = 1, i + 1
                j = i + 1
                while j < n and depth:
                    if js[j] == "{":
                        depth += 1
                    elif js[j] == "}":
                        depth -= 1
                    elif js[j] in "'\"":
                        q = js[j]
                        j += 1
                        while j < n and js[j] != q:
                            j += 2 if js[j] == "\\" else 1
                    j += 1
                assert depth == 0, f"{fname}: unterminated ${{...}} at {i}"
                i = j - 1
            elif c == "`":
                mode = None
        elif mode == "//":
            if c == "\n":
                mode = None
        elif mode == "/*":
            if c == "*" and nxt == "/":
                mode, i = None, i + 1
        i += 1
    assert mode in (None, "//"), f"{fname}: unterminated {mode} state"
    assert not stack, f"{fname}: unclosed {stack[-1][0]!r} opened at offset {stack[-1][1]}"


@pytest.mark.parametrize("page", PAGES, ids=lambda p: p.name)
def test_script_blocks_balanced(page):
    blocks = _script_blocks(page.read_text())
    assert blocks, f"{page.name}: no script blocks found"
    for js in blocks:
        if "src=" in js[:0]:  # external scripts have empty bodies anyway
            continue
        _balance(js, page.name)


def test_no_js_regex_literals():
    """_balance assumes no JS regex literals; keep that assumption pinned."""
    for page in PAGES:
        for js in _script_blocks(page.read_text()):
            assert not re.search(r"(?:match|replace|split|search|test)\(\s*/[^/*]", js), \
                f"{page.name}: JS regex literal found — update _balance to lex them"
