"""Ogg container framing (RFC 3533): page parse/write + packet assembly.

The transport layer under io/vorbis.py. Implements capture-pattern scan,
lacing-value segmentation (255-continued packets), page CRC-32 (poly
0x04C11DB7, init 0, no reflection, no final xor — Ogg's own variant)
verified on read and produced on write, continued-packet reassembly across
pages, and granule tracking. A C++ twin lives in native/hpfw_native.cc.
"""

from __future__ import annotations

import struct

import numpy as np


def _crc_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ (0x04C11DB7 if r & 0x80000000 else 0)) & 0xFFFFFFFF
        t[i] = r
    return t


_CRC = _crc_table()


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ int(_CRC[((crc >> 24) ^ b) & 0xFF])
    return crc


class Page:
    __slots__ = ("header_type", "granule", "serial", "seq", "segments")

    def __init__(self, header_type, granule, serial, seq, segments):
        self.header_type = header_type
        self.granule = granule
        self.serial = serial
        self.seq = seq
        self.segments = segments       # list[bytes], one per lacing value


def parse_pages(data: bytes) -> list[Page]:
    """All pages in the stream, CRC-verified."""
    pages = []
    pos = 0
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            raise ValueError("lost Ogg page capture")
        if data[pos + 4] != 0:
            raise ValueError(f"unsupported Ogg version {data[pos + 4]}")
        header_type = data[pos + 5]
        granule, serial, seq, crc = struct.unpack(
            "<qIII", data[pos + 6:pos + 26])
        n_segs = data[pos + 26]
        lacing = data[pos + 27:pos + 27 + n_segs]
        if len(lacing) < n_segs:
            raise ValueError("truncated Ogg page header")
        body_len = sum(lacing)
        body_start = pos + 27 + n_segs
        body = data[body_start:body_start + body_len]
        if len(body) < body_len:
            raise ValueError("truncated Ogg page body")
        page_bytes = bytearray(data[pos:body_start + body_len])
        page_bytes[22:26] = b"\x00" * 4
        if ogg_crc(bytes(page_bytes)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        segs = []
        off = 0
        for lv in lacing:
            segs.append(body[off:off + lv])
            off += lv
        pages.append(Page(header_type, granule, serial, seq,
                          [(lv, sg) for lv, sg in zip(lacing, segs)]))
        pos = body_start + body_len
    if pos != len(data):
        raise ValueError("trailing garbage after last Ogg page")
    return pages


def pages_to_packets(pages: list[Page]) -> list[tuple[bytes, int]]:
    """Reassemble packets; returns [(packet_bytes, granule_of_its_page)].

    The granule attached is the granule position of the page on which the
    packet ENDS (Ogg semantics) — -1 when the page carries none.
    """
    packets = []
    cur = bytearray()
    for pg in pages:
        for i, (lv, seg) in enumerate(pg.segments):
            cur += seg
            if lv < 255:
                packets.append((bytes(cur), pg.granule))
                cur = bytearray()
    if cur:
        raise ValueError("Ogg stream ends mid-packet")
    return packets


def write_pages(packets: list[tuple[bytes, int]], serial: int = 0x68706677
                ) -> bytes:
    """Encode packets into pages, one packet batch per page.

    packets: [(data, granule)] — each packet gets its own page (simple and
    spec-valid; real muxers pack tighter). Handles >255*255-byte packets by
    continuation pages.
    """
    out = bytearray()
    seq = 0
    n = len(packets)
    for pi, (pkt, granule) in enumerate(packets):
        # Split into lacing runs of at most 255 segments per page.
        lacing = [255] * (len(pkt) // 255) + [len(pkt) % 255]
        first_page = True
        off = 0
        while lacing:
            chunk = lacing[:255]
            lacing = lacing[255:]
            body_len = sum(chunk)
            body = pkt[off:off + body_len]
            off += body_len
            htype = 0
            if pi == 0 and first_page:
                htype |= 2                    # beginning of stream
            if pi == n - 1 and not lacing:
                htype |= 4                    # end of stream
            if not first_page:
                htype |= 1                    # continued packet
            gr = granule if not lacing else -1
            hdr = bytearray(b"OggS") + bytes([0, htype])
            hdr += struct.pack("<qIII", gr, serial, seq, 0)
            hdr += bytes([len(chunk)]) + bytes(chunk)
            page = bytes(hdr) + body
            crc = ogg_crc(page)
            page = page[:22] + struct.pack("<I", crc) + page[26:]
            out += page
            seq += 1
            first_page = False
    return bytes(out)
