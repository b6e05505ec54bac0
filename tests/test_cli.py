"""CLI smoke tests: the one-binary-many-roles surface (reference main.rs)."""

import json
import os

import pytest

from stract_tpu.main import main
from stract_tpu.warc import WarcWriter


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    warc = str(d / "c.warc.gz")
    with WarcWriter.open(warc) as w:
        w.write_record("https://a.com/", '<html lang="en"><head><title>Alpha site</title></head>'
                       '<body><h1>Alpha</h1><p>alpha content page with words</p>'
                       '<a href="https://b.com/">b</a></body></html>')
        w.write_record("https://b.com/", '<html lang="en"><head><title>Beta site</title></head>'
                       '<body><p>beta content page here with words</p></body></html>')

    def cfg(name, text):
        p = d / name
        p.write_text(text)
        return str(p)

    paths = {
        "dir": str(d),
        "warc": warc,
        "webgraph_cfg": cfg("wg.toml", f'warc_paths = ["{warc}"]\noutput_path = "{d}/graph"\nlevel = "host"\n'),
        "centrality_cfg": cfg("c.toml", f'webgraph_path = "{d}/graph"\noutput_path = "{d}/centrality"\n'),
        "indexer_cfg": cfg("i.toml", f'warc_paths = ["{warc}"]\noutput_path = "{d}/index"\n'
                                     f'host_centrality_path = "{d}/centrality"\n'),
        "spell_cfg": cfg("s.toml", f'index_path = "{d}/index"\noutput_path = "{d}/spell"\n'),
    }
    return paths


def test_cli_webgraph_centrality_indexer_spell(workspace, capsys):
    main(["webgraph", "create", workspace["webgraph_cfg"]])
    assert "2 nodes" in capsys.readouterr().out

    main(["centrality", "harmonic", workspace["centrality_cfg"]])
    assert "centrality for 2 nodes" in capsys.readouterr().out

    main(["indexer", "search", workspace["indexer_cfg"]])
    assert "indexed 2 docs" in capsys.readouterr().out

    main(["web-spell", workspace["spell_cfg"]])
    assert "spell models" in capsys.readouterr().out

    main(["admin", "index-stats", workspace["dir"] + "/index"])
    out = capsys.readouterr().out
    assert "docs=2" in out


def test_cli_safety_classifier(tmp_path, capsys):
    data = tmp_path / "train.jsonl"
    lines = [
        {"text": "adult explicit nsfw xxx content", "label": "nsfw"},
        {"text": "porn adult site video", "label": "nsfw"},
        {"text": "cooking recipes dinner food", "label": "sfw"},
        {"text": "programming tutorial code", "label": "sfw"},
    ]
    data.write_text("\n".join(json.dumps(l) for l in lines))
    model = str(tmp_path / "safety.npz")
    main(["safety-classifier", "train", str(data), model])
    capsys.readouterr()
    main(["safety-classifier", "predict", model, "explicit", "adult", "content"])
    assert "nsfw" in capsys.readouterr().out
