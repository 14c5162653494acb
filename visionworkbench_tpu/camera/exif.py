"""EXIF access (ref ``src/vw/Camera/Exif.cc`` / ``ExifData.cc``; consumer:
``tools/print_exif.cc``). Parsing delegates to PIL's EXIF reader; the
accessors mirror the reference's ``ExifView`` convenience queries."""

from __future__ import annotations

import math
from typing import Dict, Optional

from visionworkbench_tpu.core.exceptions import IOErr


def _ratio(v) -> Optional[float]:
    """EXIF rationals arrive as PIL ``IFDRational`` (float()-able) or raw
    (numerator, denominator) tuples depending on the writer."""
    if isinstance(v, tuple) and len(v) == 2:
        try:
            return float(v[0]) / float(v[1])
        except (TypeError, ValueError, ZeroDivisionError):
            return None
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


class ExifView:
    """(ref ``ExifView``, Exif.h)"""

    def __init__(self, path: str):
        from PIL import Image, ExifTags
        try:
            with Image.open(path) as im:
                raw = im.getexif()
                self.tags: Dict[str, object] = {}
                for tag_id, value in raw.items():
                    name = ExifTags.TAGS.get(tag_id, str(tag_id))
                    self.tags[name] = value
                ifd = raw.get_ifd(0x8769) if hasattr(raw, "get_ifd") else {}
                for tag_id, value in (ifd or {}).items():
                    name = ExifTags.TAGS.get(tag_id, str(tag_id))
                    self.tags.setdefault(name, value)
        except OSError as e:
            raise IOErr(f"ExifView: cannot open {path!r}: {e}")

    def get_f_number(self) -> Optional[float]:
        return _ratio(self.tags.get("FNumber"))

    def get_exposure_time(self) -> Optional[float]:
        return _ratio(self.tags.get("ExposureTime"))

    def get_iso(self) -> Optional[float]:
        return _ratio(self.tags.get("ISOSpeedRatings"))

    def get_focal_length_35mm_equiv(self) -> Optional[float]:
        return _ratio(self.tags.get("FocalLengthIn35mmFilm")
                      or self.tags.get("FocalLength"))

    def get_average_luminance(self) -> Optional[float]:
        """Brightness estimate from aperture/exposure/ISO
        (ref ``ExifView::get_average_luminance``)."""
        f = self.get_f_number()
        t = self.get_exposure_time()
        iso = self.get_iso() or 100.0
        if not f or not t:
            return None
        return (f * f) / (t * iso) * 12.5

    def camera_make(self) -> Optional[str]:
        v = self.tags.get("Make")
        return str(v) if v is not None else None

    def camera_model(self) -> Optional[str]:
        v = self.tags.get("Model")
        return str(v) if v is not None else None

    def items(self):
        return self.tags.items()
