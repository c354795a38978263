"""FUSE mount adapter — finishes L1 of the layer map.

The reference's headline capability is mounting an MLV directory so any
application (DaVinci Resolve, ACR, ...) sees per-frame CinemaDNGs
(fuse_operations table, main.c:1825-1841). This module is a thin ctypes
binding to libfuse.so.2 (FUSE API 26, the version the reference builds
against) over the `VirtualFS` library:

  read side  : getattr/readdir/open/read/release → VirtualFS
  write side : create/write/truncate/unlink/mkdir/rmdir/rename
               → `.MLD` sidecar passthrough (main.c:1578-1744)

No fusepy dependency — the container ships the C library only, so the
fuse_operations vtable and the x86_64 stat/statvfs/fuse_file_info layouts
are declared here directly.

Usage: ``mlvfs-tpu mount <mountpoint> --mlv-dir=DIR [processing flags]``
(single-threaded foreground; Python callbacks hold the GIL anyway, and the
batch converter already parallelizes the heavy work on the device).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import errno
import os
import stat as stat_mod
import sys

from .pipeline.config import ProcessingConfig
from .vfs import VirtualFS

# ---------------------------------------------------------------------------
# libfuse 2 ABI (x86_64 Linux)


class c_timespec(ctypes.Structure):
    _fields_ = [("tv_sec", ctypes.c_int64), ("tv_nsec", ctypes.c_int64)]


class c_stat(ctypes.Structure):
    # glibc x86_64 struct stat
    _fields_ = [
        ("st_dev", ctypes.c_uint64),
        ("st_ino", ctypes.c_uint64),
        ("st_nlink", ctypes.c_uint64),
        ("st_mode", ctypes.c_uint32),
        ("st_uid", ctypes.c_uint32),
        ("st_gid", ctypes.c_uint32),
        ("__pad0", ctypes.c_int),
        ("st_rdev", ctypes.c_uint64),
        ("st_size", ctypes.c_int64),
        ("st_blksize", ctypes.c_int64),
        ("st_blocks", ctypes.c_int64),
        ("st_atim", c_timespec),
        ("st_mtim", c_timespec),
        ("st_ctim", c_timespec),
        ("__glibc_reserved", ctypes.c_int64 * 3),
    ]


class c_statvfs(ctypes.Structure):
    _fields_ = [
        ("f_bsize", ctypes.c_ulong),
        ("f_frsize", ctypes.c_ulong),
        ("f_blocks", ctypes.c_uint64),
        ("f_bfree", ctypes.c_uint64),
        ("f_bavail", ctypes.c_uint64),
        ("f_files", ctypes.c_uint64),
        ("f_ffree", ctypes.c_uint64),
        ("f_favail", ctypes.c_uint64),
        ("f_fsid", ctypes.c_ulong),
        ("f_flag", ctypes.c_ulong),
        ("f_namemax", ctypes.c_ulong),
        ("__f_spare", ctypes.c_int * 6),
    ]


class fuse_file_info(ctypes.Structure):
    _fields_ = [
        ("flags", ctypes.c_int),
        ("fh_old", ctypes.c_ulong),
        ("writepage", ctypes.c_int),
        ("bits", ctypes.c_uint32),  # direct_io:1 keep_cache:1 ... padding
        ("fh", ctypes.c_uint64),
        ("lock_owner", ctypes.c_uint64),
    ]


CFUNC = ctypes.CFUNCTYPE
p_char = ctypes.c_char_p
p_void = ctypes.c_void_p
c_int = ctypes.c_int
c_size = ctypes.c_size_t
c_off = ctypes.c_int64
c_mode = ctypes.c_uint32
c_dev = ctypes.c_uint64

fuse_fill_dir_t = CFUNC(c_int, p_void, p_char, ctypes.POINTER(c_stat), c_off)

_getattr_t = CFUNC(c_int, p_char, ctypes.POINTER(c_stat))
_readlink_t = CFUNC(c_int, p_char, p_char, c_size)
_getdir_t = CFUNC(c_int, p_char, p_void, p_void)
_mknod_t = CFUNC(c_int, p_char, c_mode, c_dev)
_mkdir_t = CFUNC(c_int, p_char, c_mode)
_unlink_t = CFUNC(c_int, p_char)
_rmdir_t = CFUNC(c_int, p_char)
_symlink_t = CFUNC(c_int, p_char, p_char)
_rename_t = CFUNC(c_int, p_char, p_char)
_link_t = CFUNC(c_int, p_char, p_char)
_chmod_t = CFUNC(c_int, p_char, c_mode)
_chown_t = CFUNC(c_int, p_char, ctypes.c_uint32, ctypes.c_uint32)
_truncate_t = CFUNC(c_int, p_char, c_off)
_utime_t = CFUNC(c_int, p_char, p_void)
_open_t = CFUNC(c_int, p_char, ctypes.POINTER(fuse_file_info))
_read_t = CFUNC(c_int, p_char, p_void, c_size, c_off, ctypes.POINTER(fuse_file_info))
_write_t = CFUNC(c_int, p_char, p_void, c_size, c_off, ctypes.POINTER(fuse_file_info))
_statfs_t = CFUNC(c_int, p_char, ctypes.POINTER(c_statvfs))
_flush_t = CFUNC(c_int, p_char, ctypes.POINTER(fuse_file_info))
_release_t = CFUNC(c_int, p_char, ctypes.POINTER(fuse_file_info))
_fsync_t = CFUNC(c_int, p_char, c_int, ctypes.POINTER(fuse_file_info))
_setxattr_t = CFUNC(c_int, p_char, p_char, p_char, c_size, c_int)
_getxattr_t = CFUNC(c_int, p_char, p_char, p_char, c_size)
_listxattr_t = CFUNC(c_int, p_char, p_char, c_size)
_removexattr_t = CFUNC(c_int, p_char, p_char)
_opendir_t = CFUNC(c_int, p_char, ctypes.POINTER(fuse_file_info))
_readdir_t = CFUNC(
    c_int, p_char, p_void, fuse_fill_dir_t, c_off, ctypes.POINTER(fuse_file_info)
)
_releasedir_t = CFUNC(c_int, p_char, ctypes.POINTER(fuse_file_info))
_fsyncdir_t = CFUNC(c_int, p_char, c_int, ctypes.POINTER(fuse_file_info))
_init_t = CFUNC(p_void, p_void)
_destroy_t = CFUNC(None, p_void)
_access_t = CFUNC(c_int, p_char, c_int)
_create_t = CFUNC(c_int, p_char, c_mode, ctypes.POINTER(fuse_file_info))
_ftruncate_t = CFUNC(c_int, p_char, c_off, ctypes.POINTER(fuse_file_info))
_fgetattr_t = CFUNC(c_int, p_char, ctypes.POINTER(c_stat), ctypes.POINTER(fuse_file_info))
_lock_t = CFUNC(c_int, p_char, ctypes.POINTER(fuse_file_info), c_int, p_void)
_utimens_t = CFUNC(c_int, p_char, ctypes.POINTER(c_timespec))
_bmap_t = CFUNC(c_int, p_char, c_size, ctypes.POINTER(ctypes.c_uint64))
_ioctl_t = CFUNC(c_int, p_char, c_int, p_void, ctypes.POINTER(fuse_file_info), ctypes.c_uint, p_void)
_poll_t = CFUNC(c_int, p_char, ctypes.POINTER(fuse_file_info), p_void, ctypes.POINTER(ctypes.c_uint))
_write_buf_t = CFUNC(c_int, p_char, p_void, c_off, ctypes.POINTER(fuse_file_info))
_read_buf_t = CFUNC(c_int, p_char, ctypes.POINTER(p_void), c_size, c_off, ctypes.POINTER(fuse_file_info))
_flock_t = CFUNC(c_int, p_char, ctypes.POINTER(fuse_file_info), c_int)
_fallocate_t = CFUNC(c_int, p_char, c_int, c_off, c_off, ctypes.POINTER(fuse_file_info))


class fuse_operations(ctypes.Structure):
    # struct fuse_operations, libfuse 2.9 (the unconditional full layout;
    # FUSE_USE_VERSION only gates source-level compat shims)
    _fields_ = [
        ("getattr", _getattr_t),
        ("readlink", _readlink_t),
        ("getdir", _getdir_t),  # deprecated slot
        ("mknod", _mknod_t),
        ("mkdir", _mkdir_t),
        ("unlink", _unlink_t),
        ("rmdir", _rmdir_t),
        ("symlink", _symlink_t),
        ("rename", _rename_t),
        ("link", _link_t),
        ("chmod", _chmod_t),
        ("chown", _chown_t),
        ("truncate", _truncate_t),
        ("utime", _utime_t),
        ("open", _open_t),
        ("read", _read_t),
        ("write", _write_t),
        ("statfs", _statfs_t),
        ("flush", _flush_t),
        ("release", _release_t),
        ("fsync", _fsync_t),
        ("setxattr", _setxattr_t),
        ("getxattr", _getxattr_t),
        ("listxattr", _listxattr_t),
        ("removexattr", _removexattr_t),
        ("opendir", _opendir_t),
        ("readdir", _readdir_t),
        ("releasedir", _releasedir_t),
        ("fsyncdir", _fsyncdir_t),
        ("init", _init_t),
        ("destroy", _destroy_t),
        ("access", _access_t),
        ("create", _create_t),
        ("ftruncate", _ftruncate_t),
        ("fgetattr", _fgetattr_t),
        ("lock", _lock_t),
        ("utimens", _utimens_t),
        ("bmap", _bmap_t),
        ("flags", ctypes.c_uint32),  # flag_nullpath_ok etc. bitfield
        ("ioctl", _ioctl_t),
        ("poll", _poll_t),
        ("write_buf", _write_buf_t),
        ("read_buf", _read_buf_t),
        ("flock", _flock_t),
        ("fallocate", _fallocate_t),
    ]


def load_libfuse():
    name = ctypes.util.find_library("fuse") or "libfuse.so.2"
    lib = ctypes.CDLL(name, use_errno=True)
    lib.fuse_main_real.restype = c_int
    lib.fuse_main_real.argtypes = [
        c_int,
        ctypes.POINTER(p_char),
        ctypes.POINTER(fuse_operations),
        c_size,
        p_void,
    ]
    return lib


def fuse_available() -> bool:
    try:
        load_libfuse()
    except OSError:
        return False
    return os.path.exists("/dev/fuse")


# ---------------------------------------------------------------------------


class MLVFSMount:
    """Bridges FUSE callbacks to a VirtualFS (fuse table, main.c:1825-1841)."""

    def __init__(self, vfs: VirtualFS):
        self.vfs = vfs
        self._uid = os.getuid()
        self._gid = os.getgid()
        self._keep = []  # callback closures must outlive fuse_main

    # -- helpers --

    def _errno_of(self, exc) -> int:
        if isinstance(exc, PermissionError):
            return -errno.EPERM
        if isinstance(exc, FileNotFoundError):
            return -errno.ENOENT
        if isinstance(exc, FileExistsError):
            return -errno.EEXIST
        if isinstance(exc, IsADirectoryError):
            return -errno.EISDIR
        if isinstance(exc, NotADirectoryError):
            return -errno.ENOTDIR
        if isinstance(exc, OSError) and exc.errno:
            return -exc.errno
        return -errno.EIO

    def _wrap(self, fn):
        """Crash isolation per op, like the reference's TRY_WRAP
        (main.c:103-123): a failing callback returns an errno, never
        unwinds into the C fuse loop."""

        def call(*args):
            try:
                return fn(*args)
            except Exception as exc:  # noqa: BLE001
                rc = self._errno_of(exc)
                if rc == -errno.EIO:
                    # real failures (not path/permission semantics): say why
                    # before the errno swallows the traceback — the reference
                    # logs these too (TRY_WRAP's err_printf, main.c:103-123)
                    from .utils import log

                    log.error(
                        "%s failed: %r", getattr(fn, "__name__", fn), exc,
                        exc_info=True,
                    )
                return rc

        return call

    def _fill_stat(self, st: c_stat, is_dir: bool, size: int):
        ctypes.memset(ctypes.byref(st), 0, ctypes.sizeof(st))
        st.st_mode = (stat_mod.S_IFDIR | 0o755) if is_dir else (stat_mod.S_IFREG | 0o644)
        st.st_nlink = 2 if is_dir else 1
        st.st_size = int(size)
        st.st_blksize = 512
        st.st_blocks = (int(size) + 511) // 512
        st.st_uid = self._uid
        st.st_gid = self._gid

    # -- callbacks --

    def op_getattr(self, path, stp):
        is_dir, size = self.vfs.getattr(path.decode())
        self._fill_stat(stp.contents, is_dir, size)
        return 0

    def op_readdir(self, path, buf, filler, offset, fi):
        names = [".", ".."] + list(self.vfs.listdir(path.decode()))
        for name in names:
            if filler(buf, name.encode(), None, 0):
                break
        return 0

    def op_open(self, path, fi):
        # pin (and build, if cold) for the open-to-release window; per-chunk
        # reads then hit the cache without refcount churn
        self.vfs.open_file(path.decode())
        return 0

    def op_read(self, path, buf, size, offset, fi):
        data = self.vfs.read(path.decode(), offset=int(offset), size=int(size))
        n = len(data)
        if n:
            ctypes.memmove(buf, data, n)
        return n

    def op_release(self, path, fi):
        self.vfs.release(path.decode())
        return 0

    def op_statfs(self, path, svp):
        sv = svp.contents
        ctypes.memset(ctypes.byref(sv), 0, ctypes.sizeof(sv))
        sv.f_bsize = sv.f_frsize = 512
        sv.f_blocks = sv.f_bfree = sv.f_bavail = (1 << 30) // 512  # main.c:1747-1755
        sv.f_namemax = 255
        return 0

    def op_create(self, path, mode, fi):
        self.vfs.create(path.decode(), int(mode) & 0o777 or 0o644)
        return 0

    def op_write(self, path, buf, size, offset, fi):
        data = ctypes.string_at(buf, int(size))
        return self.vfs.write(path.decode(), data, int(offset))

    def op_truncate(self, path, length):
        self.vfs.truncate(path.decode(), int(length))
        return 0

    def op_ftruncate(self, path, length, fi):
        return self.op_truncate(path, length)

    def op_unlink(self, path):
        self.vfs.unlink(path.decode())
        return 0

    def op_mkdir(self, path, mode):
        self.vfs.mkdir(path.decode(), int(mode) & 0o777 or 0o755)
        return 0

    def op_rmdir(self, path):
        self.vfs.rmdir(path.decode())
        return 0

    def op_rename(self, old, new):
        self.vfs.rename(old.decode(), new.decode())
        return 0

    def op_utimens(self, path, ts):
        return 0  # metadata timestamps on virtual files: accept and ignore

    def op_flush(self, path, fi):
        return 0

    def op_fsync(self, path, datasync, fi):
        return 0  # files are opened/closed per operation (main.c:1610-1613)

    def op_access(self, path, amode):
        self.vfs.getattr(path.decode())
        return 0

    def operations(self) -> fuse_operations:
        ops = fuse_operations()

        def bind(slot, ctype, fn):
            cb = ctype(self._wrap(fn))
            self._keep.append(cb)
            setattr(ops, slot, cb)

        bind("getattr", _getattr_t, self.op_getattr)
        bind("readdir", _readdir_t, self.op_readdir)
        bind("open", _open_t, self.op_open)
        bind("read", _read_t, self.op_read)
        bind("release", _release_t, self.op_release)
        bind("statfs", _statfs_t, self.op_statfs)
        bind("create", _create_t, self.op_create)
        bind("write", _write_t, self.op_write)
        bind("truncate", _truncate_t, self.op_truncate)
        bind("ftruncate", _ftruncate_t, self.op_ftruncate)
        bind("unlink", _unlink_t, self.op_unlink)
        bind("mkdir", _mkdir_t, self.op_mkdir)
        bind("rmdir", _rmdir_t, self.op_rmdir)
        bind("rename", _rename_t, self.op_rename)
        bind("utimens", _utimens_t, self.op_utimens)
        bind("flush", _flush_t, self.op_flush)
        bind("fsync", _fsync_t, self.op_fsync)
        bind("access", _access_t, self.op_access)
        return ops


def mount(mountpoint: str, mlv_dir: str, config: ProcessingConfig = None,
          foreground: bool = True, fuse_args=(), port: int = 8000,
          gui_host: str = "127.0.0.1") -> int:
    """Mount an MLV directory. Blocks until unmounted (fusermount -u).

    Like the reference (main.c:1996-1998), the web dashboard starts
    alongside the mount — over the SAME VirtualFS, so /set_value changes
    what the mounted DNGs contain on the next read. ``port=0`` disables it;
    a busy port warns and mounts anyway (the GUI is auxiliary).

    Single-threaded (-s): every callback runs under the GIL anyway, and the
    reference documents -s as the safe mode (README.md:22-24). Concurrency
    comes from the engine instead: a cold DNG read decodes its whole batch in
    one device program, primes the sibling frames, and prefetches the next
    batch in the background (VirtualFS readahead) — the role the reference's
    FUSE thread pool plays, at batch rather than per-frame granularity.
    MLVFS_TPU_READAHEAD=n overrides (1 = demand paging).
    """
    cfg = config or ProcessingConfig()
    ra = os.environ.get("MLVFS_TPU_READAHEAD")
    vfs = VirtualFS(mlv_dir, cfg, readahead=int(ra) if ra else None)
    bridge = MLVFSMount(vfs)
    ops = bridge.operations()
    lib = load_libfuse()

    gui = None
    if port:
        try:
            from .server import start_dashboard

            gui = start_dashboard(vfs, port=int(port), host=gui_host)
            print(f"mlvfs-tpu dashboard on http://{gui_host}:{port}/")
        except OSError as e:
            print(f"dashboard not started ({e}); mount continues", file=sys.stderr)

    argv_list = [b"mlvfs-tpu", os.fsencode(mountpoint), b"-s"]
    if foreground:
        argv_list.append(b"-f")
    argv_list += [os.fsencode(a) for a in fuse_args]
    argv = (p_char * len(argv_list))(*argv_list)
    try:
        return lib.fuse_main_real(
            len(argv_list), argv, ctypes.byref(ops), ctypes.sizeof(ops), None
        )
    finally:
        if gui is not None:
            gui.shutdown()


def main(argv=None) -> int:
    """Entry for ``python -m mlvfs_tpu.mount <mountpoint> --mlv-dir=DIR``."""
    import argparse

    p = argparse.ArgumentParser(prog="mlvfs-tpu mount")
    p.add_argument("mountpoint")
    p.add_argument("--mlv_dir", "--mlv-dir", dest="mlv_dir", required=True)
    p.add_argument("--port", default="8000")
    p.add_argument("--no-gui", action="store_true")
    args, rest = p.parse_known_args(argv)
    return mount(
        args.mountpoint,
        args.mlv_dir,
        fuse_args=rest,
        port=0 if args.no_gui else int(args.port),
    )


if __name__ == "__main__":
    sys.exit(main())
