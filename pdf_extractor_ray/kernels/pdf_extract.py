"""Miniature PDF layout parse: object walk → content streams → text runs
→ y/x reading-order sort → ligature normalization.

This is the engine's analog of the reference's PyMuPDF page walk
(``pdf_extractor/services/pdf_service.py:13-41``: page → block → line →
span tree flattened into position records) and its reading-order
reconstruction (group spans by rounded y = line, sort lines by y, spans
within a line by x — ``finetune_commands/excel2training.py:283-316``).
PyMuPDF is not available here, so the parser is self-contained pure
Python over the PDF subset our corpus uses (and that any
"mini-PDF-with-text-operators" generator produces):

- body objects ``N 0 obj … endobj``; pages are ``/Type /Page`` dicts
  with ``/Contents N 0 R`` and optional ``/MediaBox``;
- content streams, raw or ``/FlateDecode`` (zlib);
- text operators ``BT/ET``, ``Tf`` (font size), ``Tm`` (set matrix →
  position), ``Td``/``TD`` (relative move), ``Tj`` and ``TJ`` (show
  text), literal strings with standard escapes, UTF-8 payloads.

Real-world font cmaps / ToUnicode decoding are out of scope (documented
limitation); the *pipeline* semantics — layout walk, deterministic
reading order, span/offset emission — are the capability being rebuilt.

Output spans carry top-down y coordinates (like PyMuPDF): the reading
order sort key is ``(page, round(y_top), x0)``.
"""

from __future__ import annotations

import re
import zlib

from pdf_extractor_ray.kernels.normalize import normalize_ligatures

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+0\s+obj")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# literal lengths only: '/Length 6 0 R' is an indirect reference — do
# NOT treat the object number as a byte count (fall back to the
# endstream scan instead). The (?!\d) stops backtracking from splitting
# a multi-digit object number ('/Length 60 0 R' must not match '6').
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+0\s+R)")
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![s])")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_MEDIABOX_RE = re.compile(rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]")

# content-stream tokens: literal string | hex string | number | operator
# (the (?!<) keeps dict delimiters << >> out of the hex-string group)
_TOKEN_RE = re.compile(
    rb"""
    (?P<str>\((?:\\.|[^\\()])*\))
  | (?P<hex><(?!<)[0-9A-Fa-f\s]*>)
  | (?P<num>[-+]?(?:\d+\.\d*|\.\d+|\d+))
  | (?P<op>[A-Za-z'"*]+)
  | (?P<arr>[\[\]])
    """,
    re.X,
)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}

# deterministic average glyph width as a fraction of font size — used to
# synthesize x-extents (the reference gets exact widths from PyMuPDF;
# our corpus is generated with the same constant so bboxes round-trip).
CHAR_WIDTH_FRAC = 0.5
DEFAULT_PAGE_HEIGHT = 792.0


def _decode_pdf_string(payload: bytes) -> str:
    """Literal string body (without parens) → str, handling escapes."""
    return _unescape_pdf_bytes(payload).decode("utf-8", errors="replace")


def _unescape_pdf_bytes(payload: bytes) -> bytes:
    """Literal string body (without parens) → escape-resolved bytes."""
    if b"\\" not in payload:  # fast path: no escapes
        return payload
    out = bytearray()
    i = 0
    n = len(payload)
    while i < n:
        c = payload[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = payload[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal escape \ooo (digits 0-7 ONLY:
                # \8 / \9 are "unknown escape → drop backslash" per spec,
                # and int('8', 8) would throw)
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and payload[j : j + 1] in b"01234567":
                    digits += payload[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_text_string(payload: bytes) -> str:
    """PDF *text string* semantics (spec §3.8.1, used by /Info values):
    UTF-16BE when the escape-resolved bytes open with the FE FF BOM,
    else the same UTF-8-ish decode the content path uses."""
    b = _unescape_pdf_bytes(payload)
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("utf-8", errors="replace")


def _decode_hex_string(body: bytes) -> str:
    """Hex string body (without ``<>``) → str: whitespace is ignored,
    an odd final digit is padded with 0 (PDF spec), bytes decode like
    literal strings (UTF-8 subset, errors replaced)."""
    digits = b"".join(body.split())
    if len(digits) % 2:
        digits += b"0"
    try:
        raw = bytes.fromhex(digits.decode("ascii"))
    except ValueError:
        return ""
    return raw.decode("utf-8", errors="replace")


# Fast path: the canonical single-run text block most writers emit —
# ``BT /F1 12 Tf 1 0 0 1 x y Tm (text) Tj ET``. Parsed with one match
# instead of ~13 tokenizer iterations; any stream content the fast
# regex does not fully account for falls back to the general tokenizer.
_FAST_RUN_RE = re.compile(
    rb"BT\s+/\w+\s+([\d.+-]+)\s+Tf\s+1 0 0 1\s+([\d.+-]+)\s+([\d.+-]+)\s+Tm\s+"
    rb"(\((?:\\.|[^\\()])*\))\s+Tj\s+ET\s*"
)


def _parse_content_stream_fast(data: bytes, page: int, page_height: float) -> list[dict] | None:
    """Returns spans if the WHOLE stream consists of canonical runs
    (plus whitespace), else None → caller uses the general tokenizer."""
    spans: list[dict] = []
    pos = 0
    for m in _FAST_RUN_RE.finditer(data):
        if data[pos : m.start()].strip():
            return None  # unaccounted operators between runs
        size = float(m.group(1))
        x = float(m.group(2))
        y = float(m.group(3))
        text = _decode_pdf_string(m.group(4)[1:-1])
        if text:
            width = CHAR_WIDTH_FRAC * size * len(text)
            y_top = page_height - y
            spans.append(
                {
                    "page": page,
                    "x0": x,
                    "y0": y_top - size,
                    "x1": x + width,
                    "y1": y_top,
                    "text": text,
                    "font_size": size,
                }
            )
        pos = m.end()
    if data[pos:].strip():
        return None  # trailing unaccounted content
    return spans


def _parse_content_stream(data: bytes, page: int, page_height: float) -> list[dict]:
    """Walk text operators, emit span dicts with top-down coordinates."""
    fast = _parse_content_stream_fast(data, page, page_height)
    if fast is not None:
        return fast
    spans: list[dict] = []
    x = 0.0
    y = 0.0
    size = 12.0
    leading = 0.0
    stack: list[float] = []  # pending numeric operands
    pending_strings: list[tuple[str, float]] = []  # (text, x_at_emit) inside TJ
    in_text = False
    in_array = False
    arr_parts: list[tuple[str, float]] = []

    def emit(text: str, x0: float) -> float:
        """Append a span; return the advance width."""
        if not text:
            return 0.0
        width = CHAR_WIDTH_FRAC * size * len(text)
        y_top = page_height - y
        spans.append(
            {
                "page": page,
                "x0": x0,
                "y0": y_top - size,
                "x1": x0 + width,
                "y1": y_top,
                "text": text,
                "font_size": size,
            }
        )
        return width

    for m in _TOKEN_RE.finditer(data):
        kind = m.lastgroup
        if kind == "num":
            val = float(m.group("num"))
            if in_array:
                x -= val / 1000.0 * size  # TJ kerning adjustment
            else:
                stack.append(val)
        elif kind == "str" or kind == "hex":
            if kind == "str":
                text = _decode_pdf_string(m.group("str")[1:-1])
            else:
                text = _decode_hex_string(m.group("hex")[1:-1])
            if in_array:
                arr_parts.append((text, x))
                x += CHAR_WIDTH_FRAC * size * len(text)
            else:
                pending_strings.append((text, x))
            stack.clear()
        elif kind == "arr":
            if m.group("arr") == b"[":
                in_array = True
                arr_parts = []
            else:
                in_array = False
            stack.clear()
        elif kind == "op":
            op = m.group("op")
            if op == b"BT":
                in_text = True
                x = y = 0.0
                pending_strings = []  # never leak strings across text objects
                arr_parts = []
            elif op == b"ET":
                in_text = False
                pending_strings = []
                arr_parts = []
            elif op == b"Tf" and stack:
                size = stack[-1]
            elif op == b"Tm" and len(stack) >= 6:
                x, y = stack[-2], stack[-1]
            elif op == b"Td" and len(stack) >= 2:
                x += stack[-2]
                y += stack[-1]
            elif op == b"TD" and len(stack) >= 2:
                x += stack[-2]
                y += stack[-1]
                leading = -stack[-1]
            elif op == b"TL" and stack:
                leading = stack[-1]
            elif op == b"T*":
                y -= leading
            elif op == b"Tj" or op == b"'" or op == b'"':
                # ' and " are move-to-next-line-and-show variants
                if op != b"Tj":
                    y -= leading
                if in_text:
                    for text, x0 in pending_strings:
                        emit(text, x0)
                        x = x0 + CHAR_WIDTH_FRAC * size * len(text)
                pending_strings = []
            elif op == b"TJ":
                if in_text:
                    for text, x0 in arr_parts:
                        emit(text, x0)
                arr_parts = []
            stack.clear()
    return spans


def pdf_extract(raw: bytes) -> tuple[str, list[dict]]:
    """Parse PDF bytes → ``(extracted_text, char_spans)``.

    Reading order: spans sorted by ``(page, round(line_y), x0)`` — the
    y/x line sort of ``excel2training.py:305-308``; spans on one line
    join with a space, lines with ``\\n`` (pages too: the reference
    joins page texts with ``\\n``, ``pdf_service.py:38``).

    Raises ``ValueError`` on structurally unparseable input (caller
    routes the row to quarantine).
    """
    if raw[:5] != b"%PDF-":
        raise ValueError("not a PDF: missing %PDF- header")

    objects = _parse_objects(raw)
    if not objects:
        raise ValueError("no PDF body objects found")

    pages = _page_order(objects)
    if not pages:
        raise ValueError("no /Type /Page objects with /Contents found")

    all_spans: list[dict] = []
    for page_idx, (contents_num, height) in enumerate(pages):
        entry = objects.get(contents_num)
        if entry is None:
            continue
        head, data = entry
        if data is None:
            continue
        if b"/FlateDecode" in head:
            # /Length delimits the stream exactly — do NOT strip trailing
            # newline bytes, they can be legitimate deflate data.
            try:
                data = zlib.decompress(data)
            except zlib.error:
                try:  # writers that pad the stream with an EOL
                    data = zlib.decompress(data.rstrip(b"\r\n"))
                except zlib.error as e:
                    raise ValueError(f"bad FlateDecode stream: {e}") from e
        all_spans.extend(_parse_content_stream(data, page_idx, height))

    return assemble_reading_order(all_spans)


_CATALOG_RE = re.compile(rb"/Type\s*/Catalog")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+0\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


def _page_order(objects: dict[int, tuple[bytes, bytes | None]]) -> list[tuple[int, float]]:
    """Document page order → [(contents obj num, page height)].

    Real page-tree walk: catalog → /Pages → recursive /Kids, which
    defines page order regardless of object numbering (a PDF's page
    objects are NOT required to appear in reading order). Falls back to
    object-number order when no walkable catalog exists.
    """

    def page_entry(num: int) -> tuple[int, float] | None:
        head, _ = objects[num]
        cm = _CONTENTS_RE.search(head)
        if not cm:
            return None
        mb = _MEDIABOX_RE.search(head)
        return int(cm.group(1)), float(mb.group(4)) if mb else DEFAULT_PAGE_HEIGHT

    # tree walk
    pages: list[tuple[int, float]] = []
    root_pages = None
    for num in sorted(objects):
        head, _ = objects[num]
        if _CATALOG_RE.search(head):
            pm = _PAGES_REF_RE.search(head)
            if pm:
                root_pages = int(pm.group(1))
            break
    if root_pages is not None:

        def walk(num: int, depth: int = 0) -> None:
            if depth > 64 or num not in objects:  # cycle/depth guard
                return
            head, _ = objects[num]
            km = _KIDS_RE.search(head)
            if km:  # /Pages node
                for rm in _REF_RE.finditer(km.group(1)):
                    walk(int(rm.group(1)), depth + 1)
            elif _PAGE_RE.search(head):
                entry = page_entry(num)
                if entry:
                    pages.append(entry)

        walk(root_pages)
        if pages:
            return pages

    # fallback: object-number order over /Type /Page objects
    for num in sorted(objects):
        head, _ = objects[num]
        if _PAGE_RE.search(head):
            entry = page_entry(num)
            if entry:
                pages.append(entry)
    return pages


def _parse_objects(raw: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Sequential object walk → {num: (dict_head, stream_data|None)}.

    Stream payloads are delimited by the dict's ``/Length`` (falling
    back to an ``endstream`` scan) — NEVER by regexing across the data:
    Flate-compressed bytes routinely contain ``endobj``/``endstream``
    byte sequences, which a naive regex scan mis-splits on.
    """
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    n = len(raw)
    while pos < n:
        m = _OBJ_HEAD_RE.search(raw, pos)
        if not m:
            break
        num = int(m.group(1))
        body_start = m.end()
        end_obj = raw.find(b"endobj", body_start)
        sm = _STREAM_START_RE.search(raw, body_start, end_obj if end_obj != -1 else n)
        if sm is None:
            head = raw[body_start : end_obj if end_obj != -1 else n]
            objects[num] = (head, None)
            pos = (end_obj + 6) if end_obj != -1 else n
            continue
        head = raw[body_start : sm.start()]
        data_start = sm.end()
        lm = _LENGTH_RE.search(head)
        if lm:
            data_end = data_start + int(lm.group(1))
            if data_end > n:
                raise ValueError("stream /Length beyond EOF")
        else:
            data_end = raw.find(b"endstream", data_start)
            if data_end == -1:
                raise ValueError("unterminated stream")
        objects[num] = (head, raw[data_start:data_end])
        e2 = raw.find(b"endobj", data_end)
        pos = (e2 + 6) if e2 != -1 else data_end
    _expand_object_streams(objects)
    return objects


_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm")
_N_RE = re.compile(rb"/N\s+(\d+)(?!\d)")
_FIRST_RE = re.compile(rb"/First\s+(\d+)(?!\d)")


def _expand_object_streams(objects: dict[int, tuple[bytes, bytes | None]]) -> None:
    """PDF 1.5 object streams: a ``/Type /ObjStm`` stream packs N
    stream-less objects as ``(num offset)`` pairs followed by the
    concatenated bodies at ``/First``. Members are added to the object
    table; a direct (possibly incrementally-updated) definition of the
    same number always wins, matching last-definition-in-file
    semantics."""
    for num in list(objects):
        head, data = objects[num]
        if data is None or not _OBJSTM_RE.search(head):
            continue
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                try:
                    data = zlib.decompress(data.rstrip(b"\r\n"))
                except zlib.error:
                    continue  # quarantine-grade member loss, container kept
        nm, fm = _N_RE.search(head), _FIRST_RE.search(head)
        if not nm or not fm:
            continue
        n_objs, first = int(nm.group(1)), int(fm.group(1))
        try:
            ints = [int(t) for t in data[:first].split()]
        except ValueError:
            continue
        pairs = list(zip(ints[0::2], ints[1::2]))[:n_objs]
        for i, (member_num, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(data) - first
            body = data[first + off : first + end]
            if member_num not in objects:
                objects[member_num] = (body, None)


def assemble_reading_order(spans: list[dict]) -> tuple[str, list[dict]]:
    """Sort spans into reading order and build (text, char_spans).

    Pure function of the span set — independent of emission order, which
    is what makes the pipeline's output invariant under any upstream
    ordering. Ligatures are normalized per span *before* offsets are
    assigned, so char offsets index the normalized text.
    """
    ordered = sorted(
        spans,
        key=lambda s: (s["page"], round(s["y1"]), s["x0"], s["text"]),
    )
    pieces: list[str] = []
    char_spans: list[dict] = []
    offset = 0
    prev_page = None
    prev_line = None
    for s in ordered:
        text = normalize_ligatures(s["text"]).strip()
        if not text:
            continue
        line_key = (s["page"], round(s["y1"]))
        if prev_page is None:
            sep = ""
        elif line_key == (prev_page, prev_line):
            sep = " "
        else:
            sep = "\n"
        offset += len(sep)
        if sep:
            pieces.append(sep)
        start = offset
        offset += len(text)
        pieces.append(text)
        char_spans.append(
            {
                "start": start,
                "end": offset,
                "page": s["page"],
                "bbox": [s["x0"], s["y0"], s["x1"], s["y1"]],
            }
        )
        prev_page, prev_line = line_key
    return "".join(pieces), char_spans


def find_value_position(spans: list[dict], value: str) -> tuple[int, list[float]] | None:
    """First span whose text contains ``value`` (first-match-wins
    containment join, reference ``core/extractor.py:279-293``); the
    sub-bbox is interpolated by proportional char width
    (``pdf_service.py:43-73``). Returns ``(page, bbox)`` or None."""
    needle = value.strip()
    if not needle:
        return None
    for s in spans:
        text = s["text"]
        idx = text.find(needle)
        if idx < 0:
            continue
        if len(text) == 0:
            continue
        char_w = (s["x1"] - s["x0"]) / len(text)
        x0 = s["x0"] + idx * char_w
        x1 = x0 + len(needle) * char_w
        return s["page"], [x0, s["y0"], x1, s["y1"]]
    return None


# ---------------------------------------------------------------------------
# Document-information dictionary (/Info) extraction
# ---------------------------------------------------------------------------

_INFO_REF_RE = re.compile(rb"/Info\s+(\d+)\s+0\s+R")
INFO_KEYS = (
    "Title",
    "Author",
    "Subject",
    "Keywords",
    "Creator",
    "Producer",
    "CreationDate",
    "ModDate",
)
_INFO_KEY_RES = {k: re.compile(rb"/" + k.encode() + rb"\s*([(<])") for k in INFO_KEYS}


def _scan_literal(head: bytes, i: int) -> bytes | None:
    """``head[i] == '('``: return the raw body between the OUTER parens
    (escapes preserved for the decoder), honoring backslash escapes and
    the spec's balanced unescaped nesting. None if unterminated."""
    depth = 0
    j = i
    n = len(head)
    while j < n:
        c = head[j]
        if c == 0x5C:  # backslash: skip escaped byte
            j += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return head[i + 1 : j]
        j += 1
    return None


def pdf_extract_info(raw: bytes) -> dict[str, str]:
    """Parse the PDF document-information dictionary → ``{Title,
    Author, Subject, Keywords, Creator, Producer, CreationDate,
    ModDate}`` (present keys only) — the metadata capture the reference
    reads via its PDF library (``pdf_service.py`` opens each document
    before extraction); here parsed directly: the LAST trailer's
    ``/Info N 0 R`` wins (incremental updates append trailers), the
    object's dict head yields literal ``(…)`` or hex ``<…>`` values,
    and values decode with text-string semantics (UTF-16BE BOM aware).

    Raises ``ValueError`` for non-PDF input (caller quarantines);
    returns ``{}`` for a PDF without an /Info dict.
    """
    if raw[:5] != b"%PDF-":
        raise ValueError("not a PDF: missing %PDF- header")
    t = raw.rfind(b"trailer")
    m = None
    for m in _INFO_REF_RE.finditer(raw, t if t != -1 else 0):
        pass  # last match wins
    if m is None and t > 0:
        for m in _INFO_REF_RE.finditer(raw):  # xref-stream layout: no
            pass  # 'trailer' keyword after the ref — fall back to file scan
    if m is None:
        return {}
    num = int(m.group(1))
    entry = _parse_objects(raw).get(num)
    if entry is None:
        return {}
    head = entry[0]
    out: dict[str, str] = {}
    for key, key_re in _INFO_KEY_RES.items():
        km = key_re.search(head)
        if km is None:
            continue
        start = km.start(1)
        if head[start] == 0x28:  # literal
            body = _scan_literal(head, start)
            if body is not None:
                out[key] = _decode_text_string(body)
        else:  # hex, with text-string (BOM-aware) decode semantics
            end = head.find(b">", start + 1)
            if end != -1:
                digits = b"".join(head[start + 1 : end].split())
                if len(digits) % 2:
                    digits += b"0"
                try:
                    body = bytes.fromhex(digits.decode("ascii"))
                except ValueError:
                    continue
                if body[:2] == b"\xfe\xff":
                    out[key] = body[2:].decode("utf-16-be", errors="replace")
                else:
                    out[key] = body.decode("utf-8", errors="replace")
    return out
