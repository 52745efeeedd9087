"""Minimal pure-Python HDF5 reader/writer (no h5py in this runtime).

Implements the subset of the public HDF5 File Format Specification
(v1.8/1.10, superblock v0) that Keras 2.x ``save_weights`` files use —
which is exactly what the reference persists
(/root/reference/ocrd_cor_asv_ann/lib/seq2seq.py:1121-1141: Keras
weight groups + a ``config`` group of scalar datasets and a uint32
``mapping`` array):

reader
  * superblock v0/v1 (and v2/v3), v1 object headers (+ continuations)
  * symbol-table groups (B-tree v1 + local heap + SNOD)
  * dataspace v1/v2; datatypes: fixed-point, IEEE float, fixed string,
    enum (bool), variable-length string (global heap)
  * data layouts: compact, contiguous, chunked (B-tree v1, gzip filter)
  * attribute messages v1/v2/v3 (Keras ``layer_names``/``weight_names``)

writer (fixture/persistence side)
  * the same structures, always v1 headers / symbol tables / contiguous
    data — structurally a normal "old-style" HDF5 file as produced by
    default h5py, so the reader is exercised against the real layout.

Scope: enough to round-trip every array Keras writes; not a general
HDF5 implementation (no free-space tracking, no fractal heaps / v2
B-trees, which only appear with libver='latest').
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
SIG = b"\x89HDF\r\n\x1a\n"


# ===========================================================================
# reader
# ===========================================================================


class H5Dataset:
    def __init__(self, data: np.ndarray, attrs: dict):
        self.data = data
        self.attrs = attrs

    def __getitem__(self, key):
        if key == () or key == Ellipsis:
            return self.data[()] if self.data.shape == () else self.data
        return self.data[key]


class H5Group:
    def __init__(self, name: str):
        self.name = name
        self.attrs: dict = {}
        self.members: dict[str, "H5Group | H5Dataset"] = {}

    def __contains__(self, key: str) -> bool:
        head, _, rest = key.partition("/")
        if head not in self.members:
            return False
        return (rest in self.members[head]) if rest else True

    def __getitem__(self, key: str):
        head, _, rest = key.partition("/")
        node = self.members[head]
        return node[rest] if rest else node

    def keys(self):
        return self.members.keys()

    def visit_datasets(self, prefix: str = ""):
        for name, node in self.members.items():
            path = f"{prefix}{name}"
            if isinstance(node, H5Dataset):
                yield path, node
            else:
                yield from node.visit_datasets(f"{path}/")


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf

    def u(self, off: int, n: int) -> int:
        return int.from_bytes(self.buf[off : off + n], "little")

    # --- superblock --------------------------------------------------------

    def read_root(self) -> H5Group:
        if self.buf[:8] != SIG:
            raise ValueError("not an HDF5 file (bad signature)")
        ver = self.buf[8]
        if ver in (0, 1):
            so, sl = self.buf[13], self.buf[14]
            if (so, sl) != (8, 8):
                raise NotImplementedError("only 8-byte offsets/lengths")
            # v0: 24-byte fixed prefix, then base/free-space/EOF/driver
            # addresses (4×8), then the root symbol-table entry; v1 inserts
            # 4 extra bytes (indexed-storage K + reserved) before them
            entry_off = (24 if ver == 0 else 28) + 4 * 8
            # root group symbol table entry: link name offset, OH address
            oh_addr = self.u(entry_off + 8, 8)
        elif ver in (2, 3):
            oh_addr = self.u(12 + 3 * 8, 8)
        else:
            raise NotImplementedError(f"superblock v{ver}")
        root = H5Group("/")
        self._fill_object(oh_addr, root)
        return root

    # --- object headers ----------------------------------------------------

    def _messages(self, addr: int):
        """Yield (msg_type, body_offset, body_size) for a v1 object header,
        following continuation blocks."""
        ver = self.buf[addr]
        if ver != 1:
            raise NotImplementedError(f"object header v{ver} (libver=latest?)")
        nmsgs = self.u(addr + 2, 2)
        hsize = self.u(addr + 8, 4)
        blocks = [(addr + 16, hsize)]  # 12-byte prefix + 4 pad
        got = 0
        while blocks and got < nmsgs:
            off, size = blocks.pop(0)
            end = off + size
            while off + 8 <= end and got < nmsgs:
                mtype = self.u(off, 2)
                msize = self.u(off + 2, 2)
                body = off + 8
                got += 1
                if mtype == 0x0010:  # continuation
                    blocks.append((self.u(body, 8), self.u(body + 8, 8)))
                else:
                    yield mtype, body, msize
                off = body + msize

    def _fill_object(self, addr: int, node: H5Group | None) -> "H5Group | H5Dataset":
        """Parse one object header: group (symbol table msg) or dataset."""
        attrs: dict = {}
        dtype = shape = None
        layout = None
        filters: list[int] = []
        st_btree = None
        for mtype, off, size in self._messages(addr):
            if mtype == 0x0011:  # symbol table
                st_btree = (self.u(off, 8), self.u(off + 8, 8))
            elif mtype == 0x0001:
                shape = self._dataspace(off)
            elif mtype == 0x0003:
                dtype = self._datatype(off)
            elif mtype == 0x0008:
                layout = self._layout(off)
            elif mtype == 0x000B:
                filters = self._filters(off)
            elif mtype == 0x000C:
                name, val = self._attribute(off)
                attrs[name] = val
        if st_btree is not None:
            grp = node if node is not None else H5Group("?")
            grp.attrs = attrs
            self._walk_group(st_btree[0], st_btree[1], grp)
            return grp
        data = self._read_data(dtype, shape, layout, filters)
        return H5Dataset(data, attrs)

    def _walk_group(self, btree_addr: int, heap_addr: int, grp: H5Group) -> None:
        heap_data = self._heap_data(heap_addr)

        def name_at(offset: int) -> str:
            end = heap_data.index(b"\x00", offset)
            return heap_data[offset:end].decode("utf-8")

        def walk_btree(addr: int) -> None:
            assert self.buf[addr : addr + 4] == b"TREE", "bad group B-tree"
            level = self.buf[addr + 5]
            n = self.u(addr + 6, 2)
            p = addr + 24  # past sig/type/level/entries/siblings
            children = []
            for i in range(n):
                p += 8  # key i
                children.append(self.u(p, 8))
                p += 8
            for child in children:
                if level > 0:
                    walk_btree(child)
                else:
                    self._read_snod(child, name_at, grp)

        walk_btree(btree_addr)

    def _read_snod(self, addr: int, name_at, grp: H5Group) -> None:
        assert self.buf[addr : addr + 4] == b"SNOD", "bad symbol node"
        n = self.u(addr + 6, 2)
        p = addr + 8
        for _ in range(n):
            link_off = self.u(p, 8)
            oh_addr = self.u(p + 8, 8)
            name = name_at(link_off)
            child = H5Group(name)
            grp.members[name] = self._fill_object(oh_addr, child)
            if isinstance(grp.members[name], H5Group):
                grp.members[name].name = name
            p += 40

    def _heap_data(self, addr: int) -> bytes:
        assert self.buf[addr : addr + 4] == b"HEAP", "bad local heap"
        size = self.u(addr + 8, 8)
        data_addr = self.u(addr + 24, 8)
        return self.buf[data_addr : data_addr + size]

    # --- messages ----------------------------------------------------------

    def _dataspace(self, off: int) -> tuple[int, ...]:
        ver = self.buf[off]
        ndims = self.buf[off + 1]
        flags = self.buf[off + 2]
        dims_off = off + (8 if ver == 1 else 4)
        return tuple(self.u(dims_off + 8 * i, 8) for i in range(ndims))

    def _datatype(self, off: int) -> dict:
        cv = self.buf[off]
        cls, ver = cv & 0x0F, cv >> 4
        bits = self.buf[off + 1 : off + 4]
        size = self.u(off + 4, 4)
        props = off + 8
        if cls == 0:  # fixed-point
            signed = bool(bits[0] & 0x08)
            if bits[0] & 0x01:
                raise NotImplementedError("big-endian ints")
            return {"kind": "int", "np": np.dtype(f"<{'i' if signed else 'u'}{size}"), "size": size}
        if cls == 1:  # float
            if bits[0] & 0x01:
                raise NotImplementedError("big-endian floats")
            return {"kind": "float", "np": np.dtype(f"<f{size}"), "size": size}
        if cls == 3:  # fixed string
            return {"kind": "str", "np": np.dtype(f"S{size}"), "size": size}
        if cls == 8:  # enum (h5py bool) — read as base type
            base = self._datatype(props)
            return {"kind": base["kind"], "np": base["np"], "size": size}
        if cls == 9:  # variable length
            if (bits[0] & 0x0F) != 1:
                raise NotImplementedError("vlen non-string")
            return {"kind": "vlen_str", "np": np.dtype(object), "size": size}
        raise NotImplementedError(f"datatype class {cls}")

    def _layout(self, off: int) -> dict:
        ver = self.buf[off]
        if ver != 3:
            raise NotImplementedError(f"layout v{ver}")
        cls = self.buf[off + 1]
        if cls == 0:  # compact
            sz = self.u(off + 2, 2)
            return {"cls": "compact", "off": off + 4, "size": sz}
        if cls == 1:  # contiguous
            return {"cls": "contig", "addr": self.u(off + 2, 8), "size": self.u(off + 10, 8)}
        if cls == 2:  # chunked
            nd = self.buf[off + 2]
            btree = self.u(off + 3, 8)
            dims = tuple(self.u(off + 11 + 4 * i, 4) for i in range(nd))
            return {"cls": "chunked", "btree": btree, "chunk": dims}
        raise NotImplementedError(f"layout class {cls}")

    def _filters(self, off: int) -> list[int]:
        ver = self.buf[off]
        n = self.buf[off + 1]
        ids = []
        p = off + (8 if ver == 1 else 2)
        for _ in range(n):
            fid = self.u(p, 2)
            name_len = self.u(p + 2, 2) if ver == 1 or fid >= 256 else 0
            ncv = self.u(p + 6, 2)
            ids.append(fid)
            p += 8 + name_len + 4 * ncv
            if ver == 1 and ncv % 2:
                p += 4
        return ids

    def _attribute(self, off: int) -> tuple[str, object]:
        ver = self.buf[off]
        name_size = self.u(off + 2, 2)
        dt_size = self.u(off + 4, 2)
        ds_size = self.u(off + 6, 2)
        p = off + 8
        if ver == 3:
            p += 1  # name charset
        pad = 8 if ver == 1 else 1

        def padded(n: int) -> int:
            return (n + pad - 1) // pad * pad

        name = self.buf[p : p + name_size].split(b"\x00")[0].decode("utf-8")
        p += padded(name_size)
        dtype = self._datatype(p)
        p += padded(dt_size)
        shape = self._dataspace(p)
        p += padded(ds_size)
        count = int(np.prod(shape)) if shape else 1
        val = self._elements(dtype, count, p)
        if shape == ():
            val = val[0]
        return name, val

    def _elements(self, dtype: dict, count: int, off: int):
        if dtype["kind"] == "vlen_str":
            out = []
            for i in range(count):
                p = off + i * 16
                length = self.u(p, 4)
                gaddr = self.u(p + 4, 8)
                gidx = self.u(p + 12, 4)
                out.append(self._gheap_object(gaddr, gidx)[:length])
            return np.array(out, dtype=object)
        raw = self.buf[off : off + count * dtype["size"]]
        arr = np.frombuffer(raw, dtype=dtype["np"], count=count)
        return arr

    def _gheap_object(self, addr: int, idx: int) -> bytes:
        assert self.buf[addr : addr + 4] == b"GCOL", "bad global heap"
        end = addr + self.u(addr + 8, 8)
        p = addr + 16
        while p < end:
            oidx = self.u(p, 2)
            size = self.u(p + 8, 8)
            if oidx == idx:
                return self.buf[p + 16 : p + 16 + size]
            if oidx == 0:
                break
            p += 16 + (size + 7) // 8 * 8
        raise KeyError(f"global heap object {idx}")

    # --- dataset data ------------------------------------------------------

    def _read_data(self, dtype, shape, layout, filters) -> np.ndarray:
        if dtype is None or layout is None:
            return np.zeros(0)
        count = int(np.prod(shape)) if shape else 1
        if layout["cls"] == "compact":
            raw = self.buf[layout["off"] : layout["off"] + layout["size"]]
        elif layout["cls"] == "contig":
            if layout["addr"] == UNDEF:
                return np.zeros(shape, dtype=dtype["np"])
            raw = self.buf[layout["addr"] : layout["addr"] + layout["size"]]
        else:  # chunked
            return self._read_chunked(dtype, shape, layout, filters)
        if dtype["kind"] == "vlen_str":
            raise NotImplementedError("vlen dataset")
        arr = np.frombuffer(raw, dtype=dtype["np"], count=count)
        return arr.reshape(shape) if shape else arr[0]

    def _read_chunked(self, dtype, shape, layout, filters) -> np.ndarray:
        ndim = len(shape)
        out = np.zeros(shape, dtype=dtype["np"])
        chunk = layout["chunk"][:ndim]

        def walk(addr: int) -> None:
            if addr == UNDEF:
                return
            assert self.buf[addr : addr + 4] == b"TREE", "bad chunk B-tree"
            level = self.buf[addr + 5]
            n = self.u(addr + 6, 2)
            key_size = 8 + 8 * (ndim + 1)
            p = addr + 24
            for _ in range(n):
                csize = self.u(p, 4)
                offs = tuple(self.u(p + 8 + 8 * i, 8) for i in range(ndim))
                child = self.u(p + key_size, 8)
                if level > 0:
                    walk(child)
                else:
                    raw = self.buf[child : child + csize]
                    if 1 in filters:
                        raw = zlib.decompress(raw)
                    elif filters:
                        raise NotImplementedError(f"filters {filters}")
                    block = np.frombuffer(raw, dtype=dtype["np"]).reshape(chunk)
                    sel = tuple(
                        slice(o, min(o + c, s)) for o, c, s in zip(offs, chunk, shape)
                    )
                    out[sel] = block[tuple(slice(0, s.stop - s.start) for s in sel)]
                p += key_size + 8
        walk(layout["btree"])
        return out


def read_h5(path: str) -> H5Group:
    with open(path, "rb") as f:
        return _Reader(f.read()).read_root()


# ===========================================================================
# writer
# ===========================================================================


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


class _Writer:
    """Old-style (v0 superblock, v1 headers, symbol-table groups,
    contiguous data) HDF5 writer — the layout default h5py produces."""

    def __init__(self, superblock_version: int = 0):
        # superblock placeholder: v0 = 96 bytes, v1 = +4 (indexed-storage
        # K + reserved); sized NOW so finish() can overwrite in place
        # without shifting every allocated address
        self.sb_ver = superblock_version
        self.buf = bytearray(96 if superblock_version == 0 else 100)

    def alloc(self, data: bytes) -> int:
        addr = len(self.buf)
        self.buf += data
        return addr

    # --- type/space/attr encoding ------------------------------------------

    @staticmethod
    def _dt(dtype: np.dtype) -> bytes:
        dtype = np.dtype(dtype)
        if dtype.kind == "f":
            size = dtype.itemsize
            prec = size * 8
            exp_loc, exp_sz, man_sz, bias = (
                (23, 8, 23, 127) if size == 4 else (52, 11, 52, 1023)
            )
            head = struct.pack("<B3BI", 0x11, 0x20, prec - 1, 0, size)
            props = struct.pack("<HHBBBBI", 0, prec, exp_loc, exp_sz, 0, man_sz, bias)
            return head + props
        if dtype.kind in "iu":
            size = dtype.itemsize
            bits0 = 0x08 if dtype.kind == "i" else 0x00
            head = struct.pack("<B3BI", 0x10, bits0, 0, 0, size)
            return head + struct.pack("<HH", 0, size * 8)
        if dtype.kind == "S":
            return struct.pack("<B3BI", 0x13, 0x00, 0, 0, dtype.itemsize)
        if dtype.kind == "b":
            head = struct.pack("<B3BI", 0x10, 0x08, 0, 0, 1)
            return head + struct.pack("<HH", 0, 8)
        raise NotImplementedError(f"write dtype {dtype}")

    @staticmethod
    def _ds(shape: tuple[int, ...]) -> bytes:
        body = struct.pack("<BBB5x", 1, len(shape), 0)
        for d in shape:
            body += struct.pack("<Q", d)
        return body

    def _attr_msg(self, name: str, value) -> bytes:
        if isinstance(value, str):
            value = value.encode()
        value = np.asarray(value)
        if value.dtype.kind == "U":
            value = value.astype("S")
        if value.dtype.kind == "b":
            value = value.astype(np.int8)
        nameb = name.encode() + b"\x00"
        dt = self._dt(value.dtype)
        ds = self._ds(value.shape)
        body = struct.pack("<BxHHH", 1, len(nameb), len(dt), len(ds))
        body += _pad8(nameb) + _pad8(dt) + _pad8(ds) + value.tobytes()
        return body

    @staticmethod
    def _msg(mtype: int, body: bytes) -> bytes:
        body = _pad8(body)
        return struct.pack("<HHB3x", mtype, len(body), 0) + body

    def _object_header(self, msgs: list[bytes]) -> int:
        data = b"".join(msgs)
        head = struct.pack("<BxHII4x", 1, len(msgs), 1, len(data))
        return self.alloc(head + data)

    # --- datasets / groups ---------------------------------------------------

    def write_dataset(
        self,
        arr: np.ndarray,
        attrs: dict | None = None,
        chunk: tuple[int, ...] | None = None,
        gzip: bool = False,
    ) -> int:
        """``chunk`` switches the data layout from contiguous to chunked
        (B-tree v1 index), optionally gzip-filtered — the layout real
        h5py files use for any dataset created with compression or
        resizable shapes. The fixture writer exercises BOTH paths so the
        reader is tested against real-file structure, not just its own
        simplest output."""
        # NB: np.ascontiguousarray promotes 0-d to 1-d; preserve scalar
        # dataspaces (h5py writes true ndims=0 for scalar datasets)
        arr = np.asarray(arr)
        if arr.ndim and not arr.flags["C_CONTIGUOUS"]:
            arr = np.ascontiguousarray(arr)
        if arr.dtype.kind == "b":
            arr = arr.astype(np.int8)
        if arr.dtype.kind == "U":
            arr = arr.astype("S")
        msgs = [
            self._msg(0x0001, self._ds(arr.shape)),
            self._msg(0x0003, self._dt(arr.dtype)),
        ]
        if chunk is None or arr.ndim == 0:
            data_addr = self.alloc(_pad8(arr.tobytes()))
            msgs.append(
                self._msg(0x0008, struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes))
            )
        else:
            chunk = tuple(min(c, s) for c, s in zip(chunk, arr.shape))
            btree_addr = self._write_chunks(arr, chunk, gzip)
            body = struct.pack("<BBBQ", 3, 2, arr.ndim + 1, btree_addr)
            for c in chunk:
                body += struct.pack("<I", c)
            body += struct.pack("<I", arr.itemsize)  # element-size dim
            msgs.append(self._msg(0x0008, body))
            if gzip:
                # filter pipeline v1: gzip (id 1), 1 client value (level),
                # odd value count → 4 pad bytes
                filt = struct.pack("<BB6x", 1, 1)
                filt += struct.pack("<HHHH", 1, 0, 1, 1) + struct.pack("<I", 4)
                filt += b"\x00" * 4
                msgs.append(self._msg(0x000B, filt))
        for k, v in (attrs or {}).items():
            msgs.append(self._msg(0x000C, self._attr_msg(k, v)))
        return self._object_header(msgs)

    def _write_chunks(self, arr: np.ndarray, chunk: tuple[int, ...], gzip: bool) -> int:
        """Write every chunk + a (flat, single-level) chunk B-tree v1."""
        import itertools

        entries = []  # (key bytes, chunk data address)
        ranges = [range(0, s, c) for s, c in zip(arr.shape, chunk)]
        for offs in itertools.product(*ranges):
            sel = tuple(slice(o, min(o + c, s)) for o, c, s in zip(offs, chunk, arr.shape))
            block = np.zeros(chunk, dtype=arr.dtype)
            block[tuple(slice(0, s.stop - s.start) for s in sel)] = arr[sel]
            raw = block.tobytes()
            if gzip:
                raw = zlib.compress(raw, 4)
            addr = self.alloc(_pad8(raw))
            key = struct.pack("<II", len(raw), 0)
            for o in offs:
                key += struct.pack("<Q", o)
            key += struct.pack("<Q", 0)  # element-size dimension offset
            entries.append((key, addr))
        # single leaf node (fixture arrays are small); n+1 keys, the last
        # one past-the-end per spec
        node = b"TREE" + struct.pack("<BBHQQ", 1, 0, len(entries), UNDEF, UNDEF)
        for key, addr in entries:
            node += key + struct.pack("<Q", addr)
        end_key = struct.pack("<II", 0, 0)
        for s in arr.shape:
            end_key += struct.pack("<Q", s)
        end_key += struct.pack("<Q", 0)
        node += end_key
        return self.alloc(node)

    def write_group(
        self,
        members: dict[str, int],
        attrs: dict | None = None,
        max_snod: int = 1 << 30,
    ) -> int:
        """members: name → object header address (children built first).
        ``max_snod`` bounds entries per symbol node: real h5py files split
        groups with more than 2·K_leaf (=8) links across multiple SNODs
        under one B-tree — pass a small value to emit that structure."""
        names = sorted(members)
        heap = bytearray(8)  # offset 0 = empty string
        offsets = {}
        for n in names:
            offsets[n] = len(heap)
            heap += _pad8(n.encode() + b"\x00")
        heap_data_addr = self.alloc(bytes(heap))
        heap_addr = self.alloc(
            b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap), UNDEF, heap_data_addr)
        )
        chunks = [names[i : i + max_snod] for i in range(0, len(names), max_snod)] or [[]]
        snod_addrs = []
        for part in chunks:
            snod = b"SNOD" + struct.pack("<BxH", 1, len(part))
            for n in part:
                snod += struct.pack("<QQI4x16x", offsets[n], members[n], 0)
            snod_addrs.append(self.alloc(snod))
        # one leaf-level B-tree node over all SNODs: key_i precedes
        # child_i (offset of the child's first name), final key = last name
        btree = b"TREE" + struct.pack("<BBHQQ", 0, 0, len(snod_addrs), UNDEF, UNDEF)
        for part, addr in zip(chunks, snod_addrs):
            first_key = offsets[part[0]] if part else 0
            btree += struct.pack("<QQ", first_key, addr)
        btree += struct.pack("<Q", offsets[names[-1]] if names else 0)
        btree_addr = self.alloc(btree)
        msgs = [self._msg(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]
        for k, v in (attrs or {}).items():
            msgs.append(self._msg(0x000C, self._attr_msg(k, v)))
        return self._object_header(msgs)

    def finish(self, root_addr: int) -> bytes:
        superblock_version = self.sb_ver
        if superblock_version == 0:
            sb = SIG + struct.pack("<BBBBBBBBHHI", 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0)
        elif superblock_version == 1:
            # v1 inserts indexed-storage-K + 2 reserved bytes before the
            # address block (reader: entry_off 28 vs 24)
            sb = SIG + struct.pack("<BBBBBBBBHHI", 1, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0)
            sb += struct.pack("<HH", 32, 0)
        else:
            raise NotImplementedError(f"write superblock v{superblock_version}")
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        # root symbol table entry
        sb += struct.pack("<QQI4x16x", 0, root_addr, 0)
        self.buf[: len(sb)] = sb
        return bytes(self.buf)


def write_h5(
    path: str,
    tree: dict,
    attrs_by_path: dict[str, dict] | None = None,
    chunked: bool = False,
    gzip: bool = False,
    chunk_rows: int = 16,
    max_snod: int = 1 << 30,
    superblock_version: int = 0,
) -> None:
    """Write a nested dict of {name: ndarray | subdict} as an HDF5 file.
    ``attrs_by_path`` maps group/dataset paths ('' = root, 'a/b' = nested)
    to attribute dicts.

    The layout knobs exist so fixtures can exercise the structures REAL
    h5py files use (the reader must never be validated only against this
    writer's simplest output): ``chunked``/``gzip`` store every ≥1-d
    dataset as a gzip'd chunk B-tree (chunks of ``chunk_rows`` along the
    first axis), ``max_snod`` splits large groups over multiple symbol
    nodes, ``superblock_version=1`` emits the v1 superblock variant."""
    attrs_by_path = attrs_by_path or {}
    w = _Writer(superblock_version)

    def build(node: dict, path: str) -> int:
        members = {}
        for name, child in node.items():
            sub = f"{path}{name}"
            if isinstance(child, dict):
                members[name] = build(child, sub + "/")
            else:
                arr = np.asarray(child)
                chunk = None
                if chunked and arr.ndim >= 1 and arr.size > 0 and arr.dtype.kind in "iuf":
                    chunk = (min(chunk_rows, arr.shape[0]),) + arr.shape[1:]
                members[name] = w.write_dataset(
                    arr, attrs_by_path.get(sub), chunk=chunk, gzip=gzip and chunk is not None
                )
        return w.write_group(members, attrs_by_path.get(path.rstrip("/")), max_snod=max_snod)

    root = build(tree, "")
    with open(path, "wb") as f:
        f.write(w.finish(root))
