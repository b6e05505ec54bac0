"""optics LSP server over real stdio framing (role of reference
crates/optics-lsp: diagnostics + hover + completion for .optic files)."""

import io
import json
import subprocess
import sys


def lsp_frames(*messages) -> bytes:
    out = b""
    for m in messages:
        body = json.dumps(m).encode()
        out += f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    return out


def run_session(*messages) -> list:
    proc = subprocess.run(
        [sys.executable, "-m", "stract_tpu.optics_lsp"],
        input=lsp_frames(*messages), capture_output=True, timeout=60,
    )
    data = proc.stdout
    out = []
    while data:
        head, _, rest = data.partition(b"\r\n\r\n")
        if not rest and b"Content-Length" not in head:
            break
        length = int(head.split(b":")[1])
        out.append(json.loads(rest[:length]))
        data = rest[length:]
    return out


BAD_OPTIC = 'Rule { Matches { Site("|x|" } };'  # missing closing paren
GOOD_OPTIC = 'Rule {\n    Matches {\n        Site("|x.com|")\n    },\n    Action(Boost(2))\n};'


def test_lsp_initialize_diagnostics_hover_completion():
    msgs = run_session(
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "method": "textDocument/didOpen", "params": {
            "textDocument": {"uri": "file:///a.optic", "text": BAD_OPTIC}}},
        {"jsonrpc": "2.0", "method": "textDocument/didChange", "params": {
            "textDocument": {"uri": "file:///a.optic"},
            "contentChanges": [{"text": GOOD_OPTIC}]}},
        {"jsonrpc": "2.0", "id": 2, "method": "textDocument/hover", "params": {
            "textDocument": {"uri": "file:///a.optic"},
            "position": {"line": 4, "character": 12}}},
        {"jsonrpc": "2.0", "id": 3, "method": "textDocument/completion", "params": {
            "textDocument": {"uri": "file:///a.optic"},
            "position": {"line": 0, "character": 0}}},
        {"jsonrpc": "2.0", "id": 4, "method": "shutdown", "params": {}},
        {"jsonrpc": "2.0", "method": "exit"},
    )
    init = next(m for m in msgs if m.get("id") == 1)
    assert init["result"]["capabilities"]["hoverProvider"]

    diags = [m for m in msgs if m.get("method") == "textDocument/publishDiagnostics"]
    assert len(diags) == 2
    assert diags[0]["params"]["diagnostics"], "bad optic must produce a diagnostic"
    assert diags[1]["params"]["diagnostics"] == [], "fixed optic must clear diagnostics"

    hover = next(m for m in msgs if m.get("id") == 2)
    assert "Boost" in hover["result"]["contents"]["value"]

    completion = next(m for m in msgs if m.get("id") == 3)
    labels = {i["label"] for i in completion["result"]["items"]}
    assert {"Rule", "Matches", "Action", "DiscardNonMatching"} <= labels
