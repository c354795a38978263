"""CinemaDNG header synthesis — byte-exact with the reference.

Builds the fixed-size 64 KiB TIFF/CDNG header: IFD0 with 41 entries, EXIF IFD
with 11, and a data area holding strings/rationals, laid out in the exact
order the reference emits them (dng_get_header_data, dng.c:612-789). The
image payload that follows is uncompressed 16-bit little-endian CFA data.

Tag codes/types/values are the standard TIFF/EP + DNG 1.4 + CinemaDNG
constants (dng_tag_codes.h / dng_tag_types.h / dng_tag_values.h).
"""

from __future__ import annotations

import math
import struct

from .cameras import get_camera_matrices, get_focal_resolution
from .wb import get_white_balance
from .. import SOFTWARE_NAME

HEADER_SIZE = 65536  # dng.c:43 — aligned with typical 64 KiB read granularity
IFD0_COUNT = 41
EXIF_IFD_COUNT = 11

# TIFF/DNG tag codes
tcNewSubFileType = 254
tcImageWidth = 256
tcImageLength = 257
tcBitsPerSample = 258
tcCompression = 259
tcPhotometricInterpretation = 262
tcFillOrder = 266
tcMake = 271
tcModel = 272
tcStripOffsets = 273
tcOrientation = 274
tcSamplesPerPixel = 277
tcRowsPerStrip = 278
tcStripByteCounts = 279
tcPlanarConfiguration = 284
tcSoftware = 305
tcDateTime = 306
tcCFARepeatPatternDim = 33421
tcCFAPattern = 33422
tcExposureTime = 33434
tcFNumber = 33437
tcExifIFD = 34665
tcISOSpeedRatings = 34855
tcSensitivityType = 34864
tcExifVersion = 36864
tcSubjectDistance = 37382
tcFocalLength = 37386
tcFocalPlaneXResolutionExif = 41486
tcFocalPlaneYResolutionExif = 41487
tcFocalPlaneResolutionUnitExif = 41488
tcLensModelExif = 42036
tcDNGVersion = 50706
tcUniqueCameraModel = 50708
tcBlackLevel = 50714
tcWhiteLevel = 50717
tcDefaultScale = 50718
tcDefaultCropOrigin = 50719
tcDefaultCropSize = 50720
tcColorMatrix1 = 50721
tcColorMatrix2 = 50722
tcAsShotNeutral = 50728
tcBaselineExposure = 50730
tcCameraSerialNumber = 50735
tcCalibrationIlluminant1 = 50778
tcCalibrationIlluminant2 = 50779
tcActiveArea = 50829
tcForwardMatrix1 = 50964
tcForwardMatrix2 = 50965
# CinemaDNG tags (dng.c:486-495)
tcTimeCodes = 51043
tcFrameRate = 51044
tcReelName = 51081
tcBaselineExposureOffset = 51109

# TIFF types
ttByte, ttAscii, ttShort, ttLong, ttRational = 1, 2, 3, 4, 5
ttUndefined, ttSRational = 7, 10

# tag values
sfMainImage = 0
ccUncompressed = 1
ccJPEG = 7  # lossless JPEG (SOF3) for DNG
piCFA = 32803
pcInterleaved = 1
lsStandardLightA = 17
lsD65 = 21
stISOSpeed = 3


class _DataArea:
    """The out-of-line value area after the IFDs (add_string/add_array, dng.c:496-532)."""

    def __init__(self, header: bytearray, offset: int):
        self.header = header
        self.offset = offset

    def add_string(self, s: str) -> int:
        raw = s.encode("ascii", "replace") + b"\0"
        if len(raw) <= 4:
            return int.from_bytes(raw.ljust(4, b"\0"), "little")
        pos = self.offset
        self.header[pos : pos + len(raw)] = raw
        self.offset += len(raw)
        if self.offset % 2:
            self.offset += 1
        return pos

    def add_ints(self, values) -> int:
        pos = self.offset
        raw = struct.pack(f"<{len(values)}i", *[int(v) for v in values])
        self.header[pos : pos + len(raw)] = raw
        self.offset += len(raw)
        return pos

    def add_rational(self, num: int, den: int) -> int:
        return self.add_ints([num, den])

    def add_timecode(self, framerate: float, frame: int) -> int:
        """SMPTE timecode bytes (add_timecode, dng.c:539-578)."""
        pos = self.offset
        self.header[pos : pos + 8] = timecode_bytes(framerate, frame)
        self.offset += 8
        return pos


def timecode_bytes(framerate: float, frame: int) -> bytes:
    """8 SMPTE timecode bytes for a frame (add_timecode, dng.c:539-578)."""
    if framerate == 0:
        t = 0.0
    else:
        t = frame / (round(framerate) if framerate > 1 else framerate)
    hours = int(math.floor(t / 3600))
    minutes = int(math.floor(t / 60)) % 60
    seconds = int(math.floor(t)) % 60
    frames = frame % int(round(framerate)) if framerate > 1 else 0

    def tc(v):
        return ((v // 10) << 4) | (v % 10)

    return bytes(
        [tc(frames) & 0x3F, tc(seconds) & 0x7F, tc(minutes) & 0x7F, tc(hours) & 0x3F]
    ) + b"\0" * 4


def _record(offsets, key, pos):
    """Capture a data-area position while building (template support)."""
    if offsets is not None:
        offsets[key] = pos
    return pos


def _pack2(a: int, b: int) -> int:
    """Two uint16 packed into one u32 value slot (PACK/PACK2, dng.c:37-38)."""
    return ((b & 0xFFFF) << 16) | (a & 0xFFFF)


def format_datetime(frame_headers) -> str:
    """DateTime string: RTCI time advanced by the frame's timestamp delta
    (format_datetime, dng.c:590-605)."""
    rtci = frame_headers.rtci
    delta_us = int(frame_headers.vidf["timestamp"]) - int(rtci["timestamp"])
    seconds = int(rtci["tm_sec"]) + (delta_us // 1000000) % (2**32)
    minutes = int(rtci["tm_min"]) + seconds // 60
    hours = int(rtci["tm_hour"]) + minutes // 60
    days = int(rtci["tm_mday"]) + hours // 24
    return "%04d:%02d:%02d %02d:%02d:%02d" % (
        1900 + int(rtci["tm_year"]),
        int(rtci["tm_mon"]) + 1,
        days,
        hours % 24,
        minutes % 60,
        seconds % 60,
    )


def dng_header_size() -> int:
    return HEADER_SIZE


def dng_image_size(xres: int, yres: int) -> int:
    return xres * yres * 2  # dng.c:879-882


def dng_file_size(xres: int, yres: int) -> int:
    return HEADER_SIZE + dng_image_size(xres, yres)  # dng.c:888


def build_dng_header(
    frame_headers,
    fps_override: float = 0.0,
    mlv_basename: str = "",
    compression: str = "none",
    strip_byte_count: int = None,
    _offsets: dict = None,
) -> bytes:
    """Build the 64 KiB CDNG header for one frame.

    ``frame_headers`` is a mlvfs_tpu.format.mlv.FrameHeaders. Mirrors
    dng_get_header_data (dng.c:612-789) including its squeeze-factor
    heuristics and active-area rewrite. ``compression='lj92'`` switches the
    Compression tag to lossless JPEG (7) with the given strip byte count —
    the compressed-DNG output mode the reference ships an encoder for but
    never wires up (lj92.c:1104).
    """
    header = bytearray(HEADER_SIZE)
    header[0:8] = struct.pack("<HHI", 0x4949, 42, 8)  # II, magic, first IFD at 8
    position = 8

    rawi = frame_headers.rawi
    ri = rawi["raw_info"]
    xres, yres = int(rawi["xRes"]), int(rawi["yRes"])

    model = bytes(frame_headers.idnt["cameraName"]).rstrip(b"\0").decode("ascii", "replace")
    if not model:
        model = "???"
    make = model.split(" ")[0]
    serial = bytes(frame_headers.idnt["cameraSerial"]).rstrip(b"\0").decode("ascii", "replace")

    exif_ifd_offset = position + 2 + IFD0_COUNT * 12 + 4
    data_offset = exif_ifd_offset + 2 + EXIF_IFD_COUNT * 12 + 4
    data = _DataArea(header, data_offset)

    (fpx, fpy, fp_unit) = get_focal_resolution(model)
    focal_x = [fpx[0], fpx[1]]
    focal_y = [fpy[0], fpy[1]]

    # pixel aspect / squeeze detection (dng.c:656-675)
    par = [1, 1, 1, 1]
    aa_y1, aa_x1 = int(ri["active_y1"]), int(ri["active_x1"])
    aa_y2, aa_x2 = int(ri["active_y2"]), int(ri["active_x2"])
    raw_w = float(aa_x2 - aa_x1)
    raw_h = float(aa_y2 - aa_y1)
    aspect = raw_w / raw_h if raw_h else 0.0
    if aspect > 2.0 and raw_h <= 720:
        par[2:] = [5, 3]
        focal_x[1] *= 3
        focal_y[1] *= 5
    elif raw_w < 2000:
        focal_x[1] *= 3
        focal_y[1] *= 3

    # overwrite active area if the recorded data excludes the OB areas (dng.c:677-686)
    if xres < aa_x2 or yres < aa_y2:
        aa_x1, aa_y1, aa_x2, aa_y2 = 0, 0, xres, yres
    active_area = [aa_y1, aa_x1, aa_y2, aa_x2]

    frame_rate = [int(frame_headers.mlvi["sourceFpsNom"]), int(frame_headers.mlvi["sourceFpsDenom"])]
    if fps_override > 0:
        frame_rate = [int(fps_override) * 1000, 1000]
    frame_rate_f = 0.0 if frame_rate[1] == 0 else frame_rate[0] / frame_rate[1]

    baseline_exposure = [int(ri["exposure_bias"][0]), int(ri["exposure_bias"][1])]
    if baseline_exposure[1] == 0:
        baseline_exposure = [0, 1]

    tc_frame = int(frame_headers.vidf["frameNumber"])
    cm1, cm2, fm1, fm2 = get_camera_matrices(model)
    wbal = get_white_balance(frame_headers.wbal, cm2)

    crop_x, crop_y = int(ri["crop_x"]), int(ri["crop_y"])
    black_level = int(ri["black_level"])
    white_level = int(ri["white_level"])

    # IFD0, in the reference's entry + data-area evaluation order (dng.c:717-760)
    datetime_str = format_datetime(frame_headers)
    if _offsets is not None:
        _offsets["frame_rate_f"] = frame_rate_f
        _offsets["datetime_len"] = len(datetime_str)
    ifd0 = [
        (tcNewSubFileType, ttLong, 1, sfMainImage),
        (tcImageWidth, ttLong, 1, xres),
        (tcImageLength, ttLong, 1, yres),
        (tcBitsPerSample, ttShort, 1, 16),
        (tcCompression, ttShort, 1, ccJPEG if compression == "lj92" else ccUncompressed),
        (tcPhotometricInterpretation, ttShort, 1, piCFA),
        (tcFillOrder, ttShort, 1, 1),
        (tcMake, ttAscii, len(make) + 1, data.add_string(make)),
        (tcModel, ttAscii, len(model) + 1, data.add_string(model)),
        (tcStripOffsets, ttLong, 1, HEADER_SIZE),
        (tcOrientation, ttShort, 1, 1),
        (tcSamplesPerPixel, ttShort, 1, 1),
        (tcRowsPerStrip, ttShort, 1, yres),
        (
            tcStripByteCounts,
            ttLong,
            1,
            strip_byte_count if strip_byte_count is not None else dng_image_size(xres, yres),
        ),
        (tcPlanarConfiguration, ttShort, 1, pcInterleaved),
        (tcSoftware, ttAscii, len(SOFTWARE_NAME) + 1, data.add_string(SOFTWARE_NAME)),
        (tcDateTime, ttAscii, len(datetime_str) + 1,
         _record(_offsets, "datetime", data.add_string(datetime_str))),
        (tcCFARepeatPatternDim, ttShort, 2, 0x00020002),
        (tcCFAPattern, ttByte, 4, 0x02010100),  # RGGB
        (tcExifIFD, ttLong, 1, exif_ifd_offset),
        (tcDNGVersion, ttByte, 4, 0x00000401),  # 1.4.0.0
        (tcUniqueCameraModel, ttAscii, len(model) + 1, data.add_string(model)),
        (tcBlackLevel, ttLong, 1, black_level),
        (tcWhiteLevel, ttLong, 1, white_level),
        (tcDefaultScale, ttRational, 2, data.add_ints(par)),
        (tcDefaultCropOrigin, ttShort, 2, _pack2(crop_x, crop_y)),
        (tcDefaultCropSize, ttShort, 2, _pack2(aa_x2 - aa_x1, aa_y2 - aa_y1)),
        (tcColorMatrix1, ttSRational, 9, data.add_ints(cm1)),
        (tcColorMatrix2, ttSRational, 9, data.add_ints(cm2)),
        (tcAsShotNeutral, ttRational, 3, data.add_ints(wbal)),
        (tcBaselineExposure, ttSRational, 1,
         _record(_offsets, "baseline_exposure", data.add_ints(baseline_exposure))),
        (tcCameraSerialNumber, ttAscii, len(serial) + 1, data.add_string(serial)),
        (tcCalibrationIlluminant1, ttShort, 1, lsStandardLightA),
        (tcCalibrationIlluminant2, ttShort, 1, lsD65),
        (tcActiveArea, ttLong, 4, data.add_ints(active_area)),
        (tcForwardMatrix1, ttSRational, 9, data.add_ints(fm1)),
        (tcForwardMatrix2, ttSRational, 9, data.add_ints(fm2)),
        (tcTimeCodes, ttByte, 8,
         _record(_offsets, "timecode", data.add_timecode(frame_rate_f, tc_frame))),
        (tcFrameRate, ttSRational, 1, data.add_ints(frame_rate)),
        (tcReelName, ttAscii, len(mlv_basename) + 1, data.add_string(mlv_basename)),
        (tcBaselineExposureOffset, ttSRational, 1, data.add_rational(0, 1)),
    ]
    assert len(ifd0) == IFD0_COUNT

    lens = frame_headers.lens
    expo = frame_headers.expo
    lens_name = bytes(lens["lensName"]).rstrip(b"\0").decode("ascii", "replace")
    exif_ifd = [
        (tcExposureTime, ttRational, 1, data.add_rational(int(expo["shutterValue"]) // 1000, 1000)),
        (tcFNumber, ttRational, 1, data.add_rational(int(lens["aperture"]), 100)),
        (tcISOSpeedRatings, ttShort, 1, int(expo["isoValue"])),
        (tcSensitivityType, ttShort, 1, stISOSpeed),
        (tcExifVersion, ttUndefined, 4, 0x30333230),  # "0230"
        (tcSubjectDistance, ttRational, 1, data.add_rational(int(lens["focalDist"]), 1)),
        (tcFocalLength, ttRational, 1, data.add_rational(int(lens["focalLength"]), 1)),
        (tcFocalPlaneXResolutionExif, ttRational, 1, data.add_ints(focal_x)),
        (tcFocalPlaneYResolutionExif, ttRational, 1, data.add_ints(focal_y)),
        (tcFocalPlaneResolutionUnitExif, ttShort, 1, fp_unit),
        (tcLensModelExif, ttAscii, len(lens_name) + 1, data.add_string(lens_name)),
    ]
    assert len(exif_ifd) == EXIF_IFD_COUNT

    def write_ifd(entries, pos):
        struct.pack_into("<H", header, pos, len(entries))
        pos += 2
        for tag, typ, count, value in entries:
            struct.pack_into("<HHII", header, pos, tag, typ, count, int(value) & 0xFFFFFFFF)
            if _offsets is not None:
                _offsets[("value", tag)] = pos + 8
            pos += 12
        struct.pack_into("<I", header, pos, 0)  # next IFD offset
        return pos + 4

    position = write_ifd(ifd0, position)
    assert position == exif_ifd_offset
    write_ifd(exif_ifd, position)
    return bytes(header)


class DNGHeaderTemplate:
    """Per-clip header template: build the 64 KiB header once, patch the
    per-frame fields on render.

    Across a clip's frames the header differs only in DateTime, TimeCodes,
    BaselineExposure (deflicker), Black/WhiteLevel (dual-ISO scaling) and —
    for compressed output — StripByteCounts. Rendering is one bytes copy
    plus a handful of pack_into calls (~20 µs) instead of re-evaluating the
    41+11 IFD entries (~0.6 ms), which bounded e2e host throughput.

    Byte-exactness contract: a render must equal build_dng_header() for the
    same frame. EXPO/LENS/WBAL/RTCI can change mid-clip in real MLVs, so
    callers must key templates on those blocks (see ClipConverter). If the
    DateTime string length ever differs from the template's (day overflow
    widening the field), render falls back to a full build.
    """

    def __init__(self, frame_headers, fps_override: float = 0.0,
                 mlv_basename: str = "", compression: str = "none",
                 strip_byte_count: int = None):
        self._offsets = {}
        self._base = build_dng_header(
            frame_headers, fps_override, mlv_basename,
            compression=compression, strip_byte_count=strip_byte_count,
            _offsets=self._offsets,
        )
        self._args = (fps_override, mlv_basename, compression)
        self._rtci = frame_headers.rtci

    def render(self, frame_headers, black_level: int = None,
               white_level: int = None, exposure_bias=None,
               strip_byte_count: int = None) -> bytes:
        offs = self._offsets
        datetime_str = format_datetime(frame_headers)
        if len(datetime_str) != offs["datetime_len"]:
            fps_override, basename, compression = self._args
            return build_dng_header(
                frame_headers, fps_override, basename, compression=compression,
                strip_byte_count=strip_byte_count,
            )
        buf = bytearray(self._base)
        pos = offs["datetime"]
        buf[pos : pos + len(datetime_str)] = datetime_str.encode("ascii")
        pos = offs["timecode"]
        buf[pos : pos + 8] = timecode_bytes(
            offs["frame_rate_f"], int(frame_headers.vidf["frameNumber"])
        )
        if exposure_bias is not None and int(exposure_bias[1]) != 0:
            struct.pack_into("<2i", buf, offs["baseline_exposure"],
                             int(exposure_bias[0]), int(exposure_bias[1]))
        if black_level is not None:
            struct.pack_into("<I", buf, offs[("value", tcBlackLevel)], int(black_level))
        if white_level is not None:
            struct.pack_into("<I", buf, offs[("value", tcWhiteLevel)], int(white_level))
        if strip_byte_count is not None:
            struct.pack_into("<I", buf, offs[("value", tcStripByteCounts)],
                             int(strip_byte_count))
        return bytes(buf)
