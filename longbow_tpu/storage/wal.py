"""Write-ahead log: CRC32C-framed Arrow IPC / op entries.

reference: storage/batched_wal.go (entry format :423, double-buffered
flush loop :188-420), async fsync (async_fsync.go), CRC-verified
fail-fast replay (engine.go:160-220). Frame layout lives in
native/longbow_native.cpp (lb_wal_encode/lb_wal_scan); this module
falls back to struct-packed Python framing with identical bytes when
the native library is unavailable.
"""
from __future__ import annotations

import ctypes
import io
import json
import os
import struct
import threading
import time
from pathlib import Path
from typing import Callable, Iterator, Optional

import numpy as np
import pyarrow as pa

from longbow_tpu.storage import native

KIND_BATCH = 0  # payload = Arrow IPC stream (put)
KIND_OP = 1     # payload = JSON op (delete, drop-dataset, ...)

_HDR = struct.Struct("<IQdHBI")  # crc, seq, ts, name_len, kind, payload_len


def _encode_frame(
    seq: int, ts: float, name: bytes, kind: int, payload: bytes
) -> bytes:
    lib = native.get_lib()
    if lib is not None:
        size = lib.lb_wal_frame_size(len(name), len(payload))
        buf = ctypes.create_string_buffer(size)
        n = lib.lb_wal_encode(
            buf, seq, ts, name, len(name), kind, payload, len(payload)
        )
        return buf.raw[:n]
    body = _HDR.pack(0, seq, ts, len(name), kind, len(payload))[4:]
    body += name + payload
    crc = native.crc32c(body)
    return struct.pack("<I", crc) + body


def _scan_frames(buf: bytes) -> tuple[list[int], int]:
    """-> (frame start offsets, clean prefix length)."""
    lib = native.get_lib()
    if lib is not None:
        max_entries = max(len(buf) // _HDR.size, 1)
        offsets = (ctypes.c_uint64 * max_entries)()
        valid = ctypes.c_uint64(0)
        n = lib.lb_wal_scan(
            buf, len(buf), offsets, max_entries, ctypes.byref(valid)
        )
        return list(offsets[:n]), valid.value
    out = []
    pos = 0
    while pos + _HDR.size <= len(buf):
        crc, seq, ts, nlen, kind, plen = _HDR.unpack_from(buf, pos)
        frame = _HDR.size + nlen + plen
        if pos + frame > len(buf):
            break
        if native.crc32c(buf[pos + 4 : pos + frame]) != crc:
            break
        out.append(pos)
        pos += frame
    return out, pos


class _FileBackend:
    """Portable buffered-write backend (reference: FSBackend,
    wal_backend.go:30-101)."""

    name = "fs"

    def __init__(self, path: Path):
        self.path = path
        self._f = open(path, "ab")

    def write(self, frame: bytes) -> None:
        self._f.write(frame)

    def sync(self) -> None:
        self._f.flush()
        os.fsync(self._f.fileno())

    def size(self) -> int:
        self._f.flush()
        return self.path.stat().st_size if self.path.exists() else 0

    def truncate(self) -> None:
        self._f.close()
        open(self.path, "wb").close()
        self._f = open(self.path, "ab")

    def close(self) -> None:
        self._f.close()


class _DirectBackend:
    """O_DIRECT backend (reference: direct_io_linux.go OpenFileDirect):
    appends bypass the page cache, so a group-commit sync is one
    aligned pwrite + fdatasync instead of dirtying pages the kernel
    must write back — and WAL traffic stops evicting the host-RAM
    rerank pools from cache.

    O_DIRECT requires 4096-aligned buffer address, length and file
    offset. Frames are arbitrary-sized, so appends stage into an
    mmap-backed (page-aligned) buffer and sync rewrites from the last
    block boundary, zero-padding the tail block. The padding is
    physically on disk between syncs; replay's torn-tail scan already
    treats it as a torn frame, and close() trims to the logical size.
    """

    name = "direct"
    BLOCK = 4096
    _STAGE = 4 << 20  # staging mmap; larger pending syncs in slices

    def __init__(self, path: Path):
        import mmap

        self.path = path
        self._fd = os.open(
            str(path), os.O_WRONLY | os.O_CREAT | os.O_DIRECT, 0o644
        )
        logical = path.stat().st_size if path.exists() else 0
        tail = logical % self.BLOCK
        self._flush_base = logical - tail
        self._pending = bytearray()
        if tail:
            # re-stage the partial tail block: the next sync rewrites
            # the whole block (reopen after a clean close, which trims)
            with open(path, "rb") as f:
                f.seek(self._flush_base)
                self._pending += f.read(tail)
        self._buf = mmap.mmap(-1, self._STAGE)  # page-aligned staging

    def write(self, frame: bytes) -> None:
        self._pending += frame

    def sync(self) -> None:
        data = self._pending
        if not data:
            os.fdatasync(self._fd)
            return
        pad = -len(data) % self.BLOCK
        total = len(data) + pad
        mv = memoryview(self._buf)
        off = self._flush_base
        for s in range(0, total, self._STAGE):
            m = min(self._STAGE, total - s)
            chunk = bytes(data[s:s + m])
            mv[:len(chunk)] = chunk
            if len(chunk) < m:  # zero-pad the final tail block
                mv[len(chunk):m] = b"\0" * (m - len(chunk))
            os.pwrite(self._fd, mv[:m], off + s)
        os.fdatasync(self._fd)
        # full blocks are durable; keep the partial tail staged so the
        # next sync rewrites its block with the appended bytes
        keep = len(data) % self.BLOCK
        self._flush_base = off + len(data) - keep
        self._pending = bytearray(data[len(data) - keep:]) if keep \
            else bytearray()

    def size(self) -> int:
        return self._flush_base + len(self._pending)

    def truncate(self) -> None:
        os.close(self._fd)
        open(self.path, "wb").close()
        self._fd = os.open(
            str(self.path), os.O_WRONLY | os.O_CREAT | os.O_DIRECT,
            0o644,
        )
        self._flush_base = 0
        self._pending = bytearray()

    def close(self) -> None:
        self.sync()
        # trim the zero padding so buffered readers (replay, seq
        # resume) see exactly the logical bytes
        os.ftruncate(self._fd, self._flush_base + len(self._pending))
        os.fdatasync(self._fd)
        os.close(self._fd)
        self._buf.close()


class _UringBackend:
    """Linux io_uring backend: appends are submitted asynchronously and
    the group-commit fsync is an IOSQE_IO_DRAIN-ordered fdatasync that
    reaps every completion (reference: UringBackend,
    wal_backend_linux.go:15-125; native/longbow_native.cpp lb_uring_*).
    Raises OSError at construction when the kernel/sandbox refuses
    io_uring — callers fall back to _FileBackend."""

    name = "io_uring"

    def __init__(self, path: Path, entries: int = 128):
        self._lib = native.get_lib()
        if self._lib is None:
            raise OSError("native library unavailable")
        self._h = self._lib.lb_uring_open(
            str(path).encode(), entries
        )
        if not self._h:
            raise OSError("io_uring setup failed")
        self.path = path

    def write(self, frame: bytes) -> None:
        if self._lib.lb_uring_write(self._h, frame, len(frame)) < 0:
            raise OSError("io_uring write failed")

    def sync(self) -> None:
        if self._lib.lb_uring_fsync(self._h) < 0:
            raise OSError("io_uring fsync reported IO errors")

    def size(self) -> int:
        return max(self._lib.lb_uring_size(self._h), 0)

    def truncate(self) -> None:
        if self._lib.lb_uring_truncate(self._h) < 0:
            raise OSError("io_uring truncate failed")

    def close(self) -> None:
        self._lib.lb_uring_close(self._h)
        self._h = 0


class WAL:
    """Append-only CRC-framed log with group-commit fsync."""

    PRE_SNAPSHOT_SUFFIX = ".pre-snapshot"

    def _open_backend(self):
        if self._io_uring:
            try:
                return _UringBackend(self.path)
            except OSError:
                pass  # fall back below (old kernel / seccomp / no lib)
        if self._direct_io:
            try:
                return _DirectBackend(self.path)
            except OSError:
                pass  # fs without O_DIRECT (tmpfs/overlayfs): fall back
        return _FileBackend(self.path)

    def rotate(self):
        """Move the live log aside as the snapshot capture point and
        start a fresh one; returns the rotated Path. Returns None when
        a previous rotation is still pending (an earlier snapshot
        failed before covering it) — the caller must then leave the
        live log alone and delete the stale segment only after its own
        snapshot succeeds. Recovery replays `<wal>.pre-snapshot`
        BEFORE the live log (idempotent: puts are LWW upserts)."""
        from pathlib import Path as _P

        pre = _P(str(self.path) + self.PRE_SNAPSHOT_SUFFIX)
        with self._lock:
            if pre.exists():
                return None
            self._backend.sync()
            self._backend.close()
            if self.path.exists():
                self.path.rename(pre)
            self._backend = self._open_backend()
            self._total_bytes = 0
            self._dirty = False
            return pre

    def __init__(
        self,
        path: str | Path,
        *,
        sync: str = "batch",  # "always" | "batch" | "adaptive" | "never"
        sync_interval_s: float = 0.05,
        io_uring: bool = False,
        direct_io: bool = False,
    ):
        """sync="adaptive" is the reference's AdaptiveWAL
        (adaptive_wal.go): the group-commit interval stretches under
        write load (amortize fsync across more bytes) and shrinks when
        idle (bound the ack-to-durable window). Bounds: 5ms..250ms."""
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        # resume the sequence from an existing log so seq stays unique
        # and monotonic across restarts (frames written after a reopen
        # must not reuse numbers already in the file)
        self._seq = 0
        if self.path.exists() and self.path.stat().st_size:
            buf = self.path.read_bytes()
            offsets, valid = _scan_frames(buf)
            if offsets:
                self._seq = _HDR.unpack_from(buf, offsets[-1])[1]
            if valid < len(buf):
                # TRUNCATE the torn tail from a mid-frame crash before
                # reopening for append: frames appended after garbage
                # are acked+fsynced but unreachable by fail-fast replay
                # on the NEXT restart — silent permanent loss
                import logging

                logging.getLogger("longbow.storage").warning(
                    "truncating %d torn bytes off WAL tail (%s)",
                    len(buf) - valid, self.path,
                )
                with open(self.path, "r+b") as f:
                    f.truncate(valid)
        self._io_uring = io_uring
        self._direct_io = direct_io
        self._backend = self._open_backend()
        self._lock = threading.Lock()
        # running byte total: size_bytes on the put hot path must not
        # pay a flush+stat syscall pair under the appenders' lock
        self._total_bytes = (
            self.path.stat().st_size if self.path.exists() else 0
        )
        self.sync = sync
        self._dirty = False
        self._sync_interval = sync_interval_s
        self._bytes_since_sync = 0
        self._stop = threading.Event()
        self._fsync_thread: Optional[threading.Thread] = None
        if sync in ("batch", "adaptive"):
            # reference: AsyncFsyncer decouples fsync from the write
            # path (async_fsync.go; STORAGE_ASYNC_FSYNC default true)
            self._fsync_thread = threading.Thread(
                target=self._fsync_loop, daemon=True
            )
            self._fsync_thread.start()

    # adaptive mode: aim for ~1MB per group commit within [5ms, 250ms]
    _ADAPT_TARGET_BYTES = 1 << 20
    _ADAPT_MIN_S = 0.005
    _ADAPT_MAX_S = 0.25

    def _fsync_loop(self):
        while not self._stop.wait(self._sync_interval):
            with self._lock:
                if self._dirty:
                    t0 = time.perf_counter()
                    status = "ok"
                    try:
                        self._backend.sync()
                    except Exception:
                        # a transient fsync error (EIO/ENOSPC) must not
                        # kill the group-commit thread — that silently
                        # disabled durability for the process lifetime
                        # while writes kept being acked
                        status = "error"
                        import logging

                        logging.getLogger("longbow.storage").exception(
                            "WAL fsync failed; retrying next interval"
                        )
                    finally:
                        self._dirty = status == "error"
                        try:
                            from longbow_tpu.metrics import get_registry

                            get_registry().observe(
                                "longbow_wal_fsync_duration_seconds",
                                time.perf_counter() - t0,
                                status=status,
                            )
                        except Exception:
                            pass
                batch = self._bytes_since_sync
                self._bytes_since_sync = 0
            try:
                from longbow_tpu.metrics import get_registry

                reg = get_registry()
                if batch:
                    reg.observe("longbow_wal_batch_size", batch)
                reg.set(
                    "longbow_wal_write_rate_per_second",
                    batch / max(self._sync_interval, 1e-9),
                )
                reg.set(
                    "longbow_wal_adaptive_interval_ms",
                    self._sync_interval * 1000.0,
                )
            except Exception:
                pass
            if self.sync == "adaptive":
                # stretch when saturated, shrink when idle
                if batch > self._ADAPT_TARGET_BYTES:
                    self._sync_interval = min(
                        self._sync_interval * 1.5, self._ADAPT_MAX_S
                    )
                elif batch == 0:
                    self._sync_interval = max(
                        self._sync_interval * 0.5, self._ADAPT_MIN_S
                    )

    # ------------------------------------------------------------------

    def append_batch(self, dataset: str, table: pa.Table) -> int:
        """Log a put as an Arrow IPC stream (reference logs the same
        ArrowIPC payloads, batched_wal.go:423)."""
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, table.schema) as w:
            w.write_table(table)
        return self._append(dataset.encode(), KIND_BATCH, sink.getvalue())

    def append_op(self, dataset: str, op: dict) -> int:
        return self._append(
            dataset.encode(), KIND_OP, json.dumps(op).encode()
        )

    def _append(self, name: bytes, kind: int, payload: bytes) -> int:
        with self._lock:
            self._seq += 1
            frame = _encode_frame(self._seq, time.time(), name, kind, payload)
            status = "ok"
            try:
                self._backend.write(frame)
            except Exception:
                status = "error"
                raise
            finally:
                try:
                    from longbow_tpu.metrics import get_registry

                    reg = get_registry()
                    reg.inc("longbow_wal_writes_total", status=status)
                    if status == "ok":
                        reg.inc(
                            "longbow_wal_bytes_written_total", len(frame)
                        )
                        # "pending" = bytes written but not yet fsynced
                        # (group-commit window), the closest analogue of
                        # the reference's buffered-entry gauge
                        reg.set(
                            "longbow_wal_pending_entries",
                            self._bytes_since_sync + len(frame),
                        )
                except Exception:
                    pass  # metrics must never fail a write
            self._bytes_since_sync += len(frame)
            self._total_bytes += len(frame)
            if self.sync == "always":
                self._backend.sync()
            else:
                self._dirty = True
            return self._seq

    def flush(self) -> None:
        with self._lock:
            self._backend.sync()
            self._dirty = False

    @property
    def size_bytes(self) -> int:
        return self._total_bytes  # monotonic counter, no syscalls

    @property
    def backend_name(self) -> str:
        return self._backend.name

    def truncate(self) -> None:
        """Drop all entries (after a successful snapshot)
        (reference: TruncateWAL, engine.go)."""
        with self._lock:
            self._backend.truncate()
            self._dirty = False
            self._total_bytes = 0

    def close(self) -> None:
        self._stop.set()
        if self._fsync_thread:
            self._fsync_thread.join(timeout=2)
        self.flush()
        self._backend.close()

    # ------------------------------------------------------------------

    @staticmethod
    def replay(
        path: str | Path,
    ) -> Iterator[tuple[int, float, str, int, bytes]]:
        """Yield (seq, ts, dataset, kind, payload) for every clean
        frame; stops at the first corrupt/truncated frame (fail-fast,
        reference: engine.go:160-220)."""
        path = Path(path)
        if not path.exists():
            return
        buf = path.read_bytes()
        offsets, valid = _scan_frames(buf)
        for pos in offsets:
            crc, seq, ts, nlen, kind, plen = _HDR.unpack_from(buf, pos)
            name = buf[pos + _HDR.size : pos + _HDR.size + nlen].decode()
            payload = buf[
                pos + _HDR.size + nlen : pos + _HDR.size + nlen + plen
            ]
            yield seq, ts, name, kind, payload

    @staticmethod
    def decode_batch(payload: bytes) -> pa.Table:
        return pa.ipc.open_stream(io.BytesIO(payload)).read_all()
