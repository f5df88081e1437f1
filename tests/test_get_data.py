"""Dataset downloader (utils/get_data.py) exercised against a REAL HTTP
server: a stdlib http.server on 127.0.0.1 serves an index page and a
.tar.gz dataset archive (zero-egress environments still allow loopback),
so the full scrape -> download -> extract -> cleanup path runs live —
not just construct/smoke."""

import http.server
import io
import os
import tarfile
import threading

import numpy as np
import pytest


@pytest.fixture()
def dataset_server(tmp_path):
    from PIL import Image

    root = tmp_path / "www"
    (root / "datasets").mkdir(parents=True)

    # a tiny aligned dataset archive: facades/train_all/{a_0,b_0}.png
    buf = io.BytesIO()
    rng = np.random.default_rng(0)
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name in ("facades/train_all/a_0.png", "facades/train_all/b_0.png"):
            img = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)).save(
                img, format="PNG")
            info = tarfile.TarInfo(name)
            info.size = len(img.getvalue())
            tf.addfile(info, io.BytesIO(img.getvalue()))
    (root / "datasets" / "facades.tar.gz").write_bytes(buf.getvalue())
    (root / "datasets" / "index.html").write_text(
        '<html><body><a href="facades.tar.gz">facades.tar.gz</a>'
        '<a href="notes.txt">notes.txt</a></body></html>')

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(root), **kw)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/datasets/"
    srv.shutdown()


def test_get_data_end_to_end(dataset_server, tmp_path):
    from dsgan_tpu.utils.get_data import GetData

    gd = GetData(technique="cyclegan", url=dataset_server, verbose=False)
    # listing scrape keeps only archives
    assert gd._list_archives() == ["facades.tar.gz"]

    out = gd.get(save_path=str(tmp_path / "dl"), dataset="facades.tar.gz")
    assert out == os.path.abspath(str(tmp_path / "dl" / "facades"))
    files = sorted(os.listdir(os.path.join(out, "train_all")))
    assert files == ["a_0.png", "b_0.png"]
    # archive removed after extraction
    assert not os.path.exists(str(tmp_path / "dl" / "facades.tar.gz"))


def test_get_data_offline_raises_clearly(tmp_path):
    from dsgan_tpu.utils.get_data import GetData

    gd = GetData(url="http://127.0.0.1:9/none/", verbose=False)  # port 9: discard
    with pytest.raises(RuntimeError, match="cannot reach"):
        gd._list_archives()
