"""Web dashboard — the webgui equivalent.

The reference embeds mongoose and serves a clip table with live-tunable
processing options (webgui.c): JSON get/set of every option, per-clip
metadata rows fetched lazily, and GIF previews. This is the same surface on
the Python stdlib http server, with one deliberate fix: option changes swap
an immutable ProcessingConfig snapshot instead of racing writers against
readers (the reference mutates the live struct unlocked, webgui.c:298-336).

Endpoints (parity with webgui.c:277-393):
  GET /get_value?name                    → JSON of all options
  GET /set_value?name=value              → update an option
  GET /<clip>_ROWDATA.html               → per-clip table row
  GET /<clip>_PREVIEW.gif                → animated preview
  GET /                                  → clip table page
"""

from __future__ import annotations

import dataclasses
import html
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .format.reader import is_mlv_name
from .pipeline.config import ProcessingConfig
from .vfs import VirtualFS

_FIELDS = {
    # name → (config attr, type); mirrors the /get_value names (webgui.c:281-336)
    "chroma_smooth": ("chroma_smooth", int),
    "fix_bad_pixels": ("fix_bad_pixels", int),
    "fix_stripes": ("fix_stripes", lambda v: bool(int(v))),
    "dual_iso": ("dual_iso", int),
    "hdr_interpolation_method": ("hdr_interpolation_method", int),
    "hdr_no_fullres": ("hdr_no_fullres", lambda v: bool(int(v))),
    "hdr_no_alias_map": ("hdr_no_alias_map", lambda v: bool(int(v))),
    "fix_pattern_noise": ("fix_pattern_noise", lambda v: bool(int(v))),
    "deflicker": ("deflicker", int),
    "fps": ("fps", float),
    "name_scheme": ("name_scheme", int),
}

_PAGE = """<!DOCTYPE html>
<html><head><title>MLVFS-TPU</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #999; padding: 4px 10px; }}
</style></head>
<body>
<h1>MLVFS-TPU</h1>
<h2>Processing options</h2>
<pre id="opts">{opts}</pre>
<h2>Clips</h2>
<table>
<tr><th>Clip</th><th>Frames</th><th>Audio</th><th>Resolution</th><th>FPS</th>
<th>Camera</th><th>Lens</th><th>Shutter</th><th>ISO</th></tr>
{rows}
</table>
</body></html>
"""


class Dashboard:
    def __init__(self, mlv_dir: str = None, config: ProcessingConfig = None,
                 vfs: VirtualFS = None):
        """Over its own VirtualFS, or (``vfs=``) sharing an existing one —
        the reference runs the webgui against the same live state the FUSE
        mount serves from (webgui.c:410-416), so /set_value changes what
        the mounted DNGs contain."""
        if vfs is not None:
            self.vfs = vfs
        else:
            self.vfs = VirtualFS(mlv_dir, config or ProcessingConfig(batch_size=1))
        self._lock = threading.Lock()

    @property
    def config(self) -> ProcessingConfig:
        return self.vfs.config

    def get_values(self) -> dict:
        cfg = self.config
        return {name: getattr(cfg, attr) for name, (attr, _) in _FIELDS.items()}

    def set_value(self, name: str, value: str) -> bool:
        field = _FIELDS.get(name)
        if field is None:
            return False
        attr, conv = field
        try:
            converted = conv(value)
        except (ValueError, TypeError):
            return False  # bad value → 400, config untouched
        with self._lock:
            # immutable snapshot swap — no reader/writer race
            new_cfg = dataclasses.replace(self.config, **{attr: converted})
            self.vfs.config = new_cfg
            self.vfs.buffers.clear()  # cached buffers were built with old options
            self.vfs.drop_converters()  # converters cache the old config snapshot
        return True

    def clip_row(self, name: str) -> str:
        import os

        clip = self.vfs._clip(os.path.join(self.vfs.mlv_dir, name))
        fh = clip.frame_headers(0)
        cam = bytes(fh.idnt["cameraName"]).rstrip(b"\0").decode("ascii", "replace")
        lens = bytes(fh.lens["lensName"]).rstrip(b"\0").decode("ascii", "replace")
        cells = [
            html.escape(name),
            str(clip.frame_count),
            "yes" if clip.has_audio else "no",
            f"{fh.xres}x{fh.yres}",
            f"{fh.fps:.3f}",
            html.escape(cam),
            html.escape(lens),
            f"{int(fh.expo['shutterValue'])}us",
            str(int(fh.expo["isoValue"])),
        ]
        return "<tr>" + "".join(f"<td>{c}</td>" for c in cells) + "</tr>"

    def index_page(self) -> str:
        import os

        rows = []
        for name in sorted(os.listdir(self.vfs.mlv_dir)):
            if is_mlv_name(name):
                try:
                    rows.append(self.clip_row(name))
                except Exception as exc:  # corrupt clip: show the error row
                    rows.append(f"<tr><td>{html.escape(name)}</td><td colspan=8>{html.escape(str(exc))}</td></tr>")
        return _PAGE.format(opts=html.escape(json.dumps(self.get_values(), indent=2)), rows="\n".join(rows))


def make_handler(dash: Dashboard):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="text/html; charset=utf-8"):
            if isinstance(body, str):
                body = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            path = urllib.parse.unquote(parsed.path)
            query = urllib.parse.parse_qsl(parsed.query, keep_blank_values=True)
            try:
                if path == "/get_value":
                    self._send(200, json.dumps(dash.get_values()), "application/json")
                elif path == "/set_value":
                    ok = all(dash.set_value(k, v) for k, v in query)
                    self._send(200 if ok else 400, json.dumps(dash.get_values()), "application/json")
                elif path.endswith("_ROWDATA.html"):
                    clip = path[1 : -len("_ROWDATA.html")]
                    self._send(200, dash.clip_row(clip))
                elif path.endswith("_PREVIEW.gif"):
                    clip = path[1 : -len("_PREVIEW.gif")]
                    vp = f"/{clip}/{clip[:-4]}_PREVIEW.gif"
                    try:
                        data = dash.vfs.read(vp)
                    finally:
                        # drop our ref so the buffer cache can evict it —
                        # HTTP has no 'release' callback like FUSE does
                        dash.vfs.release(vp)
                    self._send(200, data, "image/gif")
                elif path == "/" or path == "/index.html":
                    self._send(200, dash.index_page())
                else:
                    # fall through to the virtual filesystem
                    try:
                        try:
                            data = dash.vfs.read(path)
                        finally:
                            dash.vfs.release(path)
                        self._send(200, data, "application/octet-stream")
                    except FileNotFoundError:
                        self._send(404, "not found")
            except Exception as exc:
                self._send(500, f"error: {html.escape(str(exc))}")

    return Handler


def start_dashboard(vfs: VirtualFS, port: int = 8000, host: str = "127.0.0.1"):
    """webgui_start equivalent (webgui.c:395-416): run the dashboard in a
    daemon thread over an existing VirtualFS. Returns the HTTP server;
    call ``.shutdown()`` to stop it (webgui_stop)."""
    dash = Dashboard(vfs=vfs)
    server = ThreadingHTTPServer((host, port), make_handler(dash))
    t = threading.Thread(
        target=server.serve_forever, daemon=True, name="mlvfs-dashboard"
    )
    t.start()
    return server


def serve(mlv_dir: str, port: int = 8000, config: ProcessingConfig = None,
          host: str = "127.0.0.1"):
    """Run the dashboard. Binds to loopback by default — the VFS fall-through
    serves file contents, so exposing it is an explicit opt-in (--bind)."""
    dash = Dashboard(mlv_dir, config)
    server = ThreadingHTTPServer((host, port), make_handler(dash))
    print(f"mlvfs-tpu dashboard on http://{host}:{port}/ ({mlv_dir})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
