"""HTTP serving daemon: artifact behind /tts, shape envelope, WAV output."""
import functools
import http.client
import json
import threading

import jax
import numpy as np
import pytest

from radmmm_tpu.models.tts import TTSModel
from radmmm_tpu.serving import export_tts
from tests.test_tts_model import tiny_config, tiny_batch


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    rng = np.random.default_rng(0)
    model = TTSModel(config=tiny_config())
    variables = jax.jit(
        functools.partial(model.init, binarize=False, train=True))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            tiny_batch(rng))
    path = str(tmp_path_factory.mktemp("srv") / "tts.bin")
    export_tts(model, variables, path, sigma=0.8, max_frames=48,
               buckets=[(2, 12), (1, 8)])
    return path


@pytest.fixture(scope="module")
def server(artifact):
    from radmmm_tpu.server import serve

    httpd = serve(artifact, host="127.0.0.1", port=0)  # OS-assigned port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=600)
    conn.request(method, path,
                 body=json.dumps(body).encode() if body is not None else None)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, r.getheader("Content-Type"), data


def test_healthz(server):
    status, ctype, data = _request(server, "GET", "/healthz")
    assert status == 200 and ctype == "application/json"
    info = json.loads(data)
    assert info["status"] == "ok"
    assert info["buckets"] == [[1, 8], [2, 12]]
    assert info["output"] == "mel"  # tiny artifact has no vocoder baked in


def test_tts_json_mel(server):
    ids = list(range(1, 9))
    status, ctype, data = _request(server, "POST", "/tts",
                                   {"text_ids": ids, "seed": 3})
    assert status == 200 and ctype == "application/json"
    out = json.loads(data)
    assert out["output"] == "mel" and len(out["data"]) == 1
    mel = np.asarray(out["data"][0], np.float32)
    assert mel.ndim == 2 and mel.shape[0] == out["lens"][0] > 0
    assert np.isfinite(mel).all()

    # two texts of different lengths -> batched through the (2, 12) bucket
    status, _, data = _request(
        server, "POST", "/tts",
        {"text_ids": [list(range(1, 11)), list(range(1, 6))]})
    assert status == 200
    out = json.loads(data)
    assert len(out["data"]) == 2 and len(out["lens"]) == 2


def test_envelope_and_errors(server):
    # over max text length
    status, _, data = _request(server, "POST", "/tts",
                               {"text_ids": list(range(1, 20))})
    assert status == 400 and b"envelope" in data
    # no text at all
    status, _, data = _request(server, "POST", "/tts", {"seed": 1})
    assert status == 400
    # raw text without --text-config
    status, _, data = _request(server, "POST", "/tts", {"text": "hi"})
    assert status == 400 and b"text_ids" in data
    # unknown path
    status, _, _ = _request(server, "GET", "/nope")
    assert status == 404


def test_wav_container():
    from radmmm_tpu.server import _wav_bytes

    blob = _wav_bytes(np.sin(np.linspace(0, 100, 2205)), 22050)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    import io
    import wave
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == 22050
        assert w.getnframes() == 2205
        assert w.getsampwidth() == 2
