"""Header-only audio container probes: codec + sample rate + duration
without decoding a single sample.

Ingest at corpus scale should not pay a full PCM decode just to fill the
(codec, sr_hz, dur_ms) metadata columns — CONSULT's directory scan likewise
reads only the FASTA headers it needs before the heavy per-read work
(main_map.cpp:190-196).  These probes parse container/stream headers for
every format the engine knows (decodable here or behind the decoder
registry): RIFF/WAV, native FLAC, MPEG audio (mp3), Ogg (vorbis/opus),
and MP4/M4A (aac).  All pure stdlib, O(header) except the MPEG frame walk
(O(n_frames), a few bytes read per ~26 ms frame).

Every probe raises AudioDecodeError on malformed input so one corrupt file
soft-fails per-clip, mirroring the decoder contract (audio.py).
"""

from __future__ import annotations

from .audio import AudioDecodeError

# codec names match decode_clip()'s dispatch table (audio.py) so probed
# metadata routes clips to the right decoder — or to the registry stub —
# without translation.
_WAV_TAG_CODEC = {
    (1, 8): "pcm_u8",
    (1, 16): "pcm_s16le",
    (3, 32): "pcm_f32le",
    (6, 8): "pcm_alaw",
    (7, 8): "pcm_mulaw",
}

# MPEG audio header tables (ISO/IEC 11172-3 / 13818-3).  Bitrates in kbps,
# indexed [version_group][layer][bitrate_index]; version_group 0 = MPEG1,
# 1 = MPEG2/2.5.  0 entries are "free"/reserved — treated as invalid sync.
_MPEG_BITRATE = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MPEG_SR = {
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),  # MPEG2.5
}
# samples per frame, indexed [layer][mpeg1?]
_MPEG_SPF = {1: (384, 384), 2: (1152, 1152), 3: (576, 1152)}


def probe_wav(data: bytes) -> dict:
    """RIFF/WAV chunk walk -> metadata; no sample decode."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE container")
    pos, n = 12, len(data)
    fmt_tag = sr = bits = block_align = n_channels = None
    fact_samples = data_size = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        csize = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt_tag = int.from_bytes(body[0:2], "little")
            n_channels = int.from_bytes(body[2:4], "little")
            sr = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"fact" and csize >= 4:
            fact_samples = int.from_bytes(body[0:4], "little")
        elif cid == b"data":
            data_size = len(body)
        pos += 8 + csize + (csize % 2)
    if not sr or data_size is None:
        raise AudioDecodeError("missing fmt/data chunk")
    nch = max(1, n_channels or 1)
    if fmt_tag == 0x11:  # IMA ADPCM: per-block sample math (audio.py)
        codec = "adpcm_ima_wav"
        if fact_samples:
            frames = fact_samples
        elif block_align:
            samples_per_block = (block_align - 4 * nch) * 2 // nch + 1
            frames = (data_size // block_align) * samples_per_block
        else:
            frames = 0
    else:
        codec = _WAV_TAG_CODEC.get((fmt_tag, bits), "wav")
        bytes_per_frame = block_align or max(1, (bits or 16) // 8) * nch
        frames = data_size // max(1, bytes_per_frame)
    return {
        "codec": codec,
        "sr_hz": int(sr),
        "dur_ms": int(frames * 1000 // sr),
        "n_channels": nch,
    }


def probe_flac(data: bytes) -> dict:
    """STREAMINFO block only (first metadata block, audio.py layout)."""
    if data[:4] != b"fLaC":
        raise AudioDecodeError("not a FLAC stream")
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if hdr & 0x7F == 0:
            if len(body) < 18:
                raise AudioDecodeError("FLAC STREAMINFO too short")
            # sr(20) ch(3) bps(5) total(36) packed big-endian in body[10:18]
            b = body[10:18]
            sr = (b[0] << 12) | (b[1] << 4) | (b[2] >> 4)
            nch = ((b[2] >> 1) & 0x7) + 1
            total = ((b[3] & 0xF) << 32) | int.from_bytes(b[4:8], "big")
            if sr <= 0:
                raise AudioDecodeError("FLAC invalid sample rate")
            return {
                "codec": "flac",
                "sr_hz": sr,
                "dur_ms": int(total * 1000 // sr),
                "n_channels": nch,
            }
        pos += 4 + length
        if hdr >> 7:
            break
    raise AudioDecodeError("FLAC missing STREAMINFO")


def _mp3_frame(data: bytes, pos: int):
    """Parse one MPEG audio frame header at pos -> (frame_bytes,
    samples_per_frame, sr, bitrate_kbps, nch) or None if not a valid sync."""
    if pos + 4 > len(data):
        return None
    h = int.from_bytes(data[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 0x3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer = 4 - ((h >> 17) & 0x3)  # 1..3; (h>>17)&3 == 0 is reserved
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    padding = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    if version == 1 or layer == 4 or br_idx in (0, 15) or sr_idx == 3:
        return None
    sr = _MPEG_SR[version][sr_idx]
    vgroup = 0 if version == 3 else 1
    bitrate = _MPEG_BITRATE[(vgroup, layer)][br_idx]
    if bitrate == 0:
        return None
    spf = _MPEG_SPF[layer][1 if version == 3 else 0]
    if layer == 1:
        size = (12 * bitrate * 1000 // sr + padding) * 4
    else:
        size = spf // 8 * bitrate * 1000 // sr + padding
    return size, spf, sr, bitrate, 1 if mode == 3 else 2


def probe_mp3(data: bytes, max_frames: int = 2_000_000) -> dict:
    """MPEG audio (mp3) frame walk: skip ID3v2, sync, sum frame durations.
    Handles VBR correctly (every frame header is read); O(n_frames) with a
    few bytes touched per frame."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # syncsafe 28-bit size after the 10-byte header
        sz = 0
        for b in data[6:10]:
            sz = (sz << 7) | (b & 0x7F)
        pos = 10 + sz
    # resync: scan forward for the first valid frame (dirty leaders happen)
    first = None
    scan_limit = min(len(data), pos + 65536)
    while pos < scan_limit:
        fr = _mp3_frame(data, pos)
        if fr:
            # a real frame is followed by another sync (or EOF) — guards
            # against 0xFFF appearing in junk
            nxt = pos + fr[0]
            if nxt >= len(data) or _mp3_frame(data, nxt):
                first = fr
                break
        pos += 1
    if first is None:
        raise AudioDecodeError("no MPEG audio frame sync found")
    n_frames = 0
    samples = 0
    sr = first[2]
    nch = first[4]
    kbps_sum = 0
    while pos + 4 <= len(data) and n_frames < max_frames:
        fr = _mp3_frame(data, pos)
        if fr is None:
            break  # trailing garbage / ID3v1 tag
        size, spf, sr, kbps, nch = fr
        samples += spf
        kbps_sum += kbps
        n_frames += 1
        pos += size
    if n_frames == 0:
        raise AudioDecodeError("no MPEG audio frames")
    return {
        "codec": "mp3",
        "sr_hz": sr,
        "dur_ms": int(samples * 1000 // sr),
        "n_channels": nch,
        "n_frames": n_frames,
        "bitrate_kbps": kbps_sum // n_frames,
    }


def probe_ogg(data: bytes) -> dict:
    """Ogg container: identify vorbis/opus from the first page's payload,
    duration from the LAST page's granule position (sample count)."""
    if data[:4] != b"OggS":
        raise AudioDecodeError("not an Ogg stream")
    if len(data) < 28:
        raise AudioDecodeError("Ogg page truncated")
    nseg = data[26]
    payload = data[27 + nseg : 27 + nseg + 64]
    if payload[:8] == b"OpusHead":
        codec = "opus"
        nch = payload[9] if len(payload) > 9 else 1
        sr = 48000  # opus always decodes at 48 kHz
    elif payload[:7] == b"\x01vorbis":
        codec = "vorbis"
        nch = payload[11] if len(payload) > 11 else 1
        sr = int.from_bytes(payload[12:16], "little") if len(payload) >= 16 else 0
        if sr <= 0:
            raise AudioDecodeError("vorbis id header missing sample rate")
    else:
        raise AudioDecodeError("Ogg stream is neither vorbis nor opus")
    # find the last page capture from the tail; granule_position is a 64-bit
    # LE absolute sample count at offset 6
    tail_from = max(0, len(data) - 65536)
    last = data.rfind(b"OggS", tail_from)
    granule = 0
    if last >= 0 and last + 14 <= len(data):
        granule = int.from_bytes(data[last + 6 : last + 14], "little", signed=True)
        granule = max(0, granule)
    return {
        "codec": codec,
        "sr_hz": sr,
        "dur_ms": int(granule * 1000 // sr) if sr else 0,
        "n_channels": nch,
    }


def probe_mp4(data: bytes) -> dict:
    """MP4/M4A box walk (ISO/IEC 14496-12): sr_hz and n_channels come from
    the AUDIO trak — the stsd/mp4a AudioSampleEntry (channelcount @16,
    samplerate 16.16-fixed @24 of the entry body), falling back to the
    trak's mdhd media timescale — because the mvhd MOVIE timescale is a
    tick rate real muxers set to 600/1000, not the sample rate.  Duration
    prefers the audio trak's mdhd (media units) and falls back to mvhd.
    Legacy mvhd-only files (no trak) still probe via mvhd so a bare header
    yields (codec, dur_ms) rather than an error."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise AudioDecodeError("not an MP4 container")

    def boxes(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            btype = buf[pos + 4 : pos + 8]
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    return
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                body_off = pos + 16
            else:
                body_off = pos + 8
            if size < 8 or pos + size > end:
                return
            yield btype, body_off, pos + size
            pos += size

    def child(pos: int, end: int, name: bytes):
        for t, o, e in boxes(data, pos, end):
            if t == name:
                return o, e
        return None

    def timescale_duration(ioff: int, iend: int, v1_off: int, v0_off: int):
        """mvhd/mdhd share the layout: version byte, then (creation,
        modification) at 2x(4|8) bytes, then timescale u32 + duration
        (u32|u64).  v1_off/v0_off = timescale offset per version."""
        if iend - ioff < 4:
            return None
        ver = data[ioff]
        # v1 duration is u64 at v1_off+4 -> needs v1_off+12 bytes of body
        if ver == 1 and iend - ioff >= v1_off + 12:
            ts = int.from_bytes(data[ioff + v1_off : ioff + v1_off + 4], "big")
            dur = int.from_bytes(data[ioff + v1_off + 4 : ioff + v1_off + 12], "big")
        elif ver == 0 and iend - ioff >= v0_off + 8:
            ts = int.from_bytes(data[ioff + v0_off : ioff + v0_off + 4], "big")
            dur = int.from_bytes(data[ioff + v0_off + 4 : ioff + v0_off + 8], "big")
        else:
            return None
        return (ts, dur) if ts > 0 else None

    moov = child(0, len(data), b"moov")
    if moov is None:
        raise AudioDecodeError("MP4 missing moov")
    mvhd_td = None
    mvhd = child(moov[0], moov[1], b"mvhd")
    if mvhd is not None:
        mvhd_td = timescale_duration(mvhd[0], mvhd[1], 20, 12)

    sr = nch = None
    media_td = None
    for ttyp, toff, tend in boxes(data, moov[0], moov[1]):
        if ttyp != b"trak":
            continue
        mdia = child(toff, tend, b"mdia")
        if mdia is None:
            continue
        hdlr = child(mdia[0], mdia[1], b"hdlr")
        # handler_type u32 at body offset 8 (after version/flags+pre_defined)
        if hdlr is None or hdlr[1] - hdlr[0] < 12 or data[hdlr[0] + 8 : hdlr[0] + 12] != b"soun":
            continue
        mdhd = child(mdia[0], mdia[1], b"mdhd")
        if mdhd is not None:
            media_td = timescale_duration(mdhd[0], mdhd[1], 20, 12)
        minf = child(mdia[0], mdia[1], b"minf")
        stbl = child(minf[0], minf[1], b"stbl") if minf else None
        stsd = child(stbl[0], stbl[1], b"stsd") if stbl else None
        if stsd is not None:
            # stsd body: version/flags u32, entry_count u32, then entries;
            # AudioSampleEntry body: 6 reserved + 2 dref idx + 8 reserved,
            # channelcount u16 @16, samplesize u16 @18, pre_defined+rsvd
            # @20..24, samplerate 16.16 fixed u32 @24
            for etyp, eoff, eend in boxes(data, stsd[0] + 8, stsd[1]):
                if etyp in (b"mp4a", b"alac", b"ac-3", b"ec-3", b"Opus", b"fLaC") and eend - eoff >= 28:
                    nch = int.from_bytes(data[eoff + 16 : eoff + 18], "big") or None
                    sr = int.from_bytes(data[eoff + 24 : eoff + 28], "big") >> 16 or None
                    break
        break  # first audio trak wins

    td = media_td or mvhd_td
    if td is None:
        raise AudioDecodeError("MP4 missing mvhd/mdhd timescale")
    timescale, duration = td
    # last-resort sr: the audio trak's media timescale IS the sample rate
    # by convention; a trak-less legacy header falls through to mvhd
    sr = sr or timescale
    return {
        "codec": "aac",
        "sr_hz": sr,
        "dur_ms": int(duration * 1000 // timescale),
        "n_channels": nch if nch else 2,
    }


def probe_audio(data: bytes) -> dict:
    """Sniff the container by magic and dispatch to the right probe.
    -> {codec, sr_hz, dur_ms, n_channels, [n_frames, bitrate_kbps]}"""
    if len(data) < 4:
        raise AudioDecodeError("payload too short to sniff")
    if data[:4] == b"RIFF":
        return probe_wav(data)
    if data[:4] == b"fLaC":
        return probe_flac(data)
    if data[:4] == b"OggS":
        return probe_ogg(data)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return probe_mp4(data)
    if data[:3] == b"ID3" or (data[0] == 0xFF and (data[1] & 0xE0) == 0xE0):
        return probe_mp3(data)
    raise AudioDecodeError("unrecognized audio container")


def sniff_codec(data: bytes) -> str:
    """Codec name only, 'unknown' instead of raising — the cheap column for
    ingest metrics / triage histograms."""
    try:
        return probe_audio(data)["codec"]
    except AudioDecodeError:
        return "unknown"
