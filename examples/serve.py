#!/usr/bin/env python3
"""Transcription HTTP server — the serving-deployment example.

Single-model, batched: concurrent requests are queued and transcribed
together through the BatchTranscriber (weight reads amortize across
requests; the TPU answer to the reference's model-clone-per-thread serving,
ModelImpl.cpp:40-60). Stdlib only.

  python examples/serve.py ggml-base.en.bin --port 8080
  curl -X POST --data-binary @audio.wav http://localhost:8080/transcribe
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import sys
import threading

sys.path.insert(0, __file__.rsplit("/", 2)[0])


class _Job:
    def __init__(self, audio):
        self.audio = audio
        self.done = threading.Event()
        self.result = None
        self.error: str | None = None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--language", default="en")
    args = ap.parse_args()

    import numpy as np

    import whisper_tpu
    from whisper_tpu.api.params import FullParams
    from whisper_tpu.runtime.batch import BatchTranscriber

    model = whisper_tpu.load_model(args.model)
    bt = BatchTranscriber(model, batch=args.batch)
    params = FullParams(language=args.language)
    jobs: "queue.Queue[_Job]" = queue.Queue()

    def worker():
        while True:
            batch = [jobs.get()]
            while len(batch) < args.batch:
                try:
                    batch.append(jobs.get_nowait())
                except queue.Empty:
                    break
            try:
                results = bt.transcribe([j.audio for j in batch], params)
                for j, r in zip(batch, results):
                    j.result = r
            except Exception as e:  # report per-job
                for j in batch:
                    j.error = str(e)
            for j in batch:
                j.done.set()

    threading.Thread(target=worker, daemon=True).start()

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    # Minimal browser front-end — the WhisperDesktop transcribe-dialog role
    # (Examples/WhisperDesktop/TranscribeDlg.h) as a single stdlib-served page.
    INDEX = b"""<!doctype html><meta charset=utf-8><title>whisper_tpu</title>
<body style="font-family:sans-serif;max-width:48rem;margin:2rem auto">
<h2>whisper_tpu transcription</h2>
<p>Pick a 16-bit PCM .wav file; it is POSTed to <code>/transcribe</code>.</p>
<input type=file id=f accept=.wav>
<button onclick=go()>Transcribe</button>
<pre id=out style="white-space:pre-wrap;background:#f4f4f4;padding:1rem"></pre>
<script>
async function go(){
  const f=document.getElementById('f').files[0];
  const out=document.getElementById('out');
  if(!f){out.textContent='choose a .wav file first';return}
  out.textContent='transcribing...';
  const r=await fetch('/transcribe',{method:'POST',body:await f.arrayBuffer()});
  if(!r.ok){out.textContent='error: '+await r.text();return}
  const j=await r.json();
  out.textContent=j.segments.map(s=>
    '['+s.t0.toFixed(2)+' - '+s.t1.toFixed(2)+']'+s.text).join('\\n');
}
</script>"""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path not in ("/", "/index.html"):
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(INDEX)))
            self.end_headers()
            self.wfile.write(INDEX)

        def do_POST(self):
            if self.path != "/transcribe":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            try:
                from scipy.io import wavfile

                rate, pcm = wavfile.read(io.BytesIO(data))
                from whisper_tpu.audio.load import resample_to_16k

                if pcm.dtype.kind == "i":
                    pcm = pcm.astype(np.float32) / np.iinfo(pcm.dtype).max
                if pcm.ndim == 2:
                    pcm = pcm.mean(axis=1)
                audio = resample_to_16k(pcm.astype(np.float32), rate)
            except Exception as e:
                self.send_error(400, f"bad audio: {e}")
                return

            job = _Job(audio)
            jobs.put(job)
            job.done.wait()
            if job.error:
                self.send_error(500, job.error)
                return
            body = json.dumps(
                {
                    "text": job.result.text,
                    "segments": [
                        {"t0": s.t0 / 100.0, "t1": s.t1 / 100.0, "text": s.text}
                        for s in job.result.segments
                    ],
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    print(f"serving on :{args.port} (batch={args.batch})", file=sys.stderr)
    ThreadingHTTPServer(("", args.port), Handler).serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
