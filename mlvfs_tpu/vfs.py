"""Virtual filesystem view of an MLV directory.

The reference presents each .MLV as a virtual directory of CinemaDNG frames
plus .wav/.log/_PREVIEW.gif through FUSE (main.c:1084-1823). This module is
that presentation layer as a library: a `VirtualFS` maps virtual paths to
listings, attributes, and offset-addressable file contents, backed by the
batch conversion engine. The web dashboard (`server.py`) and any mount
adapter sit on top of it.

Components mirrored:
  - path resolution and naming schemes incl. DaVinci Resolve names
    (mlvfs_resolve_path main.c:800-872, get_mlv_basename main.c:715-735,
    get_mlv_name_from_basename main.c:752-778)
  - directory listing semantics (mlvfs_readdir main.c:1272-1405), including
    .MLD sidecar passthrough
  - the decoded-frame cache with the reference's bounds: at most 4 unused
    and 16 total buffers in memory (resource_manager.c:39-40)
"""

from __future__ import annotations

import os
import re
import threading

import numpy as np

from .format.reader import MLVClip, is_mlv_name
from .pipeline.config import ProcessingConfig
from .emit import dng as dng_emit
from .emit.wav import build_wav, wav_size
from .emit.gif import build_gif, gif_size

_RESOLVE_RE = re.compile(r"(.+)(MLV|mlv)_1_\d+-\d+-\d+_\d+_[Cc]\d+")


class ResourceManager:
    """Keyed cache of built byte buffers with the reference's eviction bounds
    (get_or_create_image_buffer / image_buffer_cleanup,
    resource_manager.c:92-227): <= 4 unused buffers, <= 16 total."""

    MAX_UNUSED = 4
    MAX_TOTAL = 16

    def __init__(self):
        self._lock = threading.Lock()
        self._entries = {}  # key -> dict(value, refs, lock)
        self._order = []

    def get_or_create(self, key, builder):
        with self._lock:
            e = self._entries.get(key)
            if e is None:
                e = {"value": None, "refs": 0, "lock": threading.Lock()}
                self._entries[key] = e
                self._order.append(key)
            e["refs"] += 1
        with e["lock"]:
            if e["value"] is None:
                e["value"] = builder()
        return e["value"]

    def release(self, key):
        with self._lock:
            e = self._entries.get(key)
            if e is None:
                return
            e["refs"] = max(0, e["refs"] - 1)
            self._evict()

    def _evict(self):
        unused = [k for k in self._order if self._entries[k]["refs"] == 0]
        # oldest-first eviction beyond the bounds
        while len(unused) > self.MAX_UNUSED or len(self._order) > self.MAX_TOTAL:
            victim = None
            for k in self._order:
                if self._entries[k]["refs"] == 0:
                    victim = k
                    break
            if victim is None:
                break
            self._order.remove(victim)
            del self._entries[victim]
            unused.remove(victim)

    def clear(self):
        with self._lock:
            self._entries.clear()
            self._order.clear()


class VirtualFS:
    def __init__(self, mlv_dir: str, config: ProcessingConfig = None):
        self.mlv_dir = os.path.abspath(mlv_dir)
        self.config = config or ProcessingConfig(batch_size=1)
        self.buffers = ResourceManager()
        self._clips = {}
        self._converters = {}
        self._lock = threading.RLock()

    # -- naming -------------------------------------------------------------

    def virtual_dir_name(self, mlv_filename: str) -> str:
        """Display name of a clip's virtual directory (get_mlv_basename)."""
        base, ext = os.path.splitext(os.path.basename(mlv_filename))
        if self.config.name_scheme == 1:
            clip = self._clip(os.path.join(self.mlv_dir, mlv_filename))
            rtci = clip.frame_headers(0).rtci
            return "%s%s_1_%d-%02d-%02d_%04d_C%04d" % (
                base,
                ext[1:],
                1900 + int(rtci["tm_year"]),
                int(rtci["tm_mon"]) + 1,
                int(rtci["tm_mday"]),
                1,
                0,
            )
        return base + ext

    def _mlv_from_virtual_dir(self, name: str):
        """Reverse the naming scheme → real .MLV filename or None."""
        if self.config.name_scheme == 1:
            m = _RESOLVE_RE.match(name)
            if m:
                return f"{m.group(1)}.{m.group(2)}"
            return None
        return name if is_mlv_name(name) else None

    # -- clip access ----------------------------------------------------------

    def _clip(self, mlv_path: str) -> MLVClip:
        with self._lock:
            clip = self._clips.get(mlv_path)
            if clip is None:
                clip = MLVClip(mlv_path, use_sidecar=self.config.use_sidecar_idx)
                self._clips[mlv_path] = clip
            return clip

    def _converter(self, mlv_path: str):
        from .pipeline.convert import ClipConverter

        with self._lock:
            conv = self._converters.get(mlv_path)
            if conv is None:
                conv = ClipConverter(self._clip(mlv_path), self.config)
                self._converters[mlv_path] = conv
            return conv

    def drop_converters(self):
        """Discard converters (and their cached config/calibration/jit state)
        so the next build picks up a new config snapshot. Without this,
        option changes were silently ignored for already-rendered clips."""
        with self._lock:
            convs = list(self._converters.values())
            self._converters.clear()
        for conv in convs:
            conv.close()

    # -- resolution -----------------------------------------------------------

    def _confined(self, base: str, relpath: str):
        """realpath(base/relpath) iff it stays inside base, else None.

        Every virtual path that maps onto the host filesystem goes through
        here: without it, a request like ``/../../etc/passwd`` would escape
        the namespace root (and the dashboard serves vfs.read over HTTP)."""
        root = os.path.realpath(base)
        real = os.path.realpath(os.path.join(root, relpath))
        if real == root or real.startswith(root + os.sep):
            return real
        return None

    def resolve(self, vpath: str):
        """Virtual path → (mlv_path | None, path_inside | None, real_path | None)."""
        vpath = vpath.strip("/")
        if not vpath:
            return None, None, self.mlv_dir
        parts = vpath.split("/")
        # walk prefixes looking for a clip directory (mlvfs_resolve_path)
        for i in range(1, len(parts) + 1):
            candidate = "/".join(parts[:i])
            mlv_name = self._mlv_from_virtual_dir(parts[i - 1])
            if mlv_name is not None:
                prefix = "/".join(parts[: i - 1] + [mlv_name])
                real = self._confined(self.mlv_dir, prefix)
                if real is not None and os.path.isfile(real):
                    return real, "/".join(parts[i:]), None
        real = self._confined(self.mlv_dir, vpath)
        if real is not None and os.path.exists(real):
            return None, None, real
        return None, None, None

    def _mld_sub(self, mlv_path: str, inside: str):
        """Confined path inside the clip's .MLD sidecar dir, or None."""
        return self._confined(mlv_path[:-4] + ".MLD", inside)

    _VIRTUAL_SUFFIXES = (".dng", ".wav", ".gif", ".log")

    def resolve_write(self, vpath: str):
        """Virtual path → on-disk path for write-side ops, or None if the
        target is a virtual file (mlvfs_resolve_virtual, main.c:1035-1082).

        Inside a clip directory, root-level .dng/.wav/.gif/.log (except
        AppleDouble ._* names) are virtual; everything else maps into the
        clip's .MLD sidecar dir. Outside clip directories paths map straight
        into the namespace root. Unlike resolve(), the target need not exist
        (create/mkdir/rename destinations).
        """
        vpath = vpath.strip("/")
        if not vpath:
            return None  # the root itself is not writable as a file
        parts = vpath.split("/")
        for i in range(1, len(parts) + 1):
            mlv_name = self._mlv_from_virtual_dir(parts[i - 1])
            if mlv_name is None:
                continue
            prefix = "/".join(parts[: i - 1] + [mlv_name])
            real_mlv = self._confined(self.mlv_dir, prefix)
            if real_mlv is None or not os.path.isfile(real_mlv):
                continue
            inside = parts[i:]
            if not inside:
                return real_mlv  # the MLV itself
            name = inside[-1]
            if (
                len(inside) == 1
                and name.lower().endswith(self._VIRTUAL_SUFFIXES)
                and not name.startswith("._")
            ):
                return None  # virtual DNG/WAV/GIF/log
            return self._mld_sub(real_mlv, "/".join(inside))
        return self._confined(self.mlv_dir, vpath)

    def _ensure_mld(self, real_path: str):
        """Create the .MLD sidecar dir on demand (check_mld_exists,
        main.c:874-893)."""
        idx = real_path.find(".MLD")
        if idx >= 0:
            mld = real_path[: idx + 4]
            if not os.path.isdir(mld):
                os.makedirs(mld, exist_ok=True)

    # -- write-side passthrough (main.c:1578-1744) -----------------------------

    def create(self, vpath: str, mode: int = 0o644):
        real = self.resolve_write(vpath)
        if real is None:
            raise PermissionError(vpath)
        self._ensure_mld(real)
        fd = os.open(real, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, mode)
        os.close(fd)

    def write(self, vpath: str, data: bytes, offset: int = 0) -> int:
        real = self.resolve_write(vpath)
        if real is None:
            raise PermissionError(vpath)
        fd = os.open(real, os.O_RDWR)
        try:
            return os.pwrite(fd, data, offset)
        finally:
            os.close(fd)

    def truncate(self, vpath: str, length: int = 0):
        real = self.resolve_write(vpath)
        if real is None:
            raise PermissionError(vpath)
        os.truncate(real, length)

    def unlink(self, vpath: str):
        real = self.resolve_write(vpath)
        if real is None:
            raise PermissionError(vpath)
        os.unlink(real)

    def mkdir(self, vpath: str, mode: int = 0o777):
        real = self.resolve_write(vpath)
        if real is None:
            raise PermissionError(vpath)
        self._ensure_mld(real)
        # mkdir of the clip's virtual root resolves to the MLV file itself;
        # the reference treats that as success (main.c:1615-1631)
        if not os.path.exists(real):
            os.mkdir(real, mode)

    def rmdir(self, vpath: str):
        real = self.resolve_write(vpath)
        if real is None:
            raise PermissionError(vpath)
        os.rmdir(real)

    def rename(self, vfrom: str, vto: str):
        real_from = self.resolve_write(vfrom)
        real_to = self.resolve_write(vto)
        if real_from is None or real_to is None:
            raise PermissionError(f"{vfrom} -> {vto}")
        self._ensure_mld(real_to)
        os.rename(real_from, real_to)

    # -- listing ----------------------------------------------------------------

    def listdir(self, vpath: str = "/"):
        mlv_path, inside, real = self.resolve(vpath)
        if mlv_path is None:
            if real is None or not os.path.isdir(real):
                raise FileNotFoundError(vpath)
            out = []
            for name in sorted(os.listdir(real)):
                if is_mlv_name(name):
                    out.append(self.virtual_dir_name(name))
                else:
                    out.append(name)
            return out
        if inside:
            # inside a clip: only the .MLD sidecar passthrough has subpaths
            sub = self._mld_sub(mlv_path, inside)
            if sub is not None and os.path.isdir(sub):
                return sorted(os.listdir(sub))
            raise FileNotFoundError(vpath)
        clip = self._clip(mlv_path)
        basename = os.path.splitext(os.path.basename(mlv_path))[0]
        names = [f"{basename}_{i:06d}.dng" for i in range(clip.frame_count)]
        if clip.has_audio:
            names.append(f"{basename}.wav")
        names.append(f"{basename}.log")
        names.append(f"{basename}_PREVIEW.gif")
        mld = mlv_path[:-4] + ".MLD"
        if os.path.isdir(mld):
            names.extend(sorted(os.listdir(mld)))
        return names

    # -- attributes ---------------------------------------------------------------

    def getattr(self, vpath: str):
        """(is_dir, size). DNG sizes come from headers without decoding
        (register_dng_attr semantics, resource_manager.c:319-391)."""
        mlv_path, inside, real = self.resolve(vpath)
        if mlv_path is None:
            if real is None:
                raise FileNotFoundError(vpath)
            st = os.stat(real)
            return os.path.isdir(real), st.st_size
        if not inside:
            return True, 0
        clip = self._clip(mlv_path)
        fh = clip.frame_headers(0)
        name = inside.split("/")[-1]
        if name.endswith(".dng"):
            return False, dng_emit.dng_file_size(fh.xres, fh.yres)
        if name.endswith(".wav"):
            return False, wav_size(clip)
        if name.endswith("_PREVIEW.gif"):
            return False, gif_size(fh.xres, fh.yres)
        if name.endswith(".log"):
            return False, len(clip.debug_log().encode())
        sub = self._mld_sub(mlv_path, inside)
        if sub is not None and os.path.exists(sub):
            st = os.stat(sub)
            return os.path.isdir(sub), st.st_size
        raise FileNotFoundError(vpath)

    # -- reads ------------------------------------------------------------------------

    def read(self, vpath: str, offset: int = 0, size: int = None) -> bytes:
        """Offset-addressable read of a virtual file (mlvfs_read semantics)."""
        data = self._file_bytes(vpath)
        if size is None:
            size = len(data) - offset
        return data[offset : offset + size]

    def _file_bytes(self, vpath: str) -> bytes:
        mlv_path, inside, real = self.resolve(vpath)
        if mlv_path is None or not inside:
            if real is not None and os.path.isfile(real):
                with open(real, "rb") as f:
                    return f.read()
            raise FileNotFoundError(vpath)
        name = inside.split("/")[-1]
        clip = self._clip(mlv_path)
        key = (mlv_path, inside)
        if name.endswith(".dng"):
            frame = int(name[-10:-4])
            return self.buffers.get_or_create(key, lambda: self._build_dng(mlv_path, frame))
        if name.endswith(".wav"):
            return self.buffers.get_or_create(key, lambda: build_wav(clip))
        if name.endswith("_PREVIEW.gif"):
            return self.buffers.get_or_create(key, lambda: build_gif(clip))
        if name.endswith(".log"):
            return clip.debug_log().encode()
        sub = self._mld_sub(mlv_path, inside)
        if sub is not None and os.path.isfile(sub):
            with open(sub, "rb") as f:
                return f.read()
        raise FileNotFoundError(vpath)

    def release(self, vpath: str):
        mlv_path, inside, _ = self.resolve(vpath)
        if mlv_path and inside:
            self.buffers.release((mlv_path, inside))

    def _build_dng(self, mlv_path: str, frame: int) -> bytes:
        conv = self._converter(mlv_path)
        clip = conv.clip
        imgs = conv.decode_batch([frame])
        imgs, info = conv.process_batch(imgs, [frame])
        img = np.asarray(imgs)[0].astype("<u2")
        fh = clip.frame_headers(frame)
        conv._apply_info(fh, info, 0)
        basename = os.path.splitext(os.path.basename(mlv_path))[0]
        header = dng_emit.build_dng_header(fh, self.config.fps, basename)
        return header + img.tobytes()
