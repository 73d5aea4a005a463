"""Deterministic rule-based NER labeler (the engine's parity-testable
"model" backend).

Reimplements the reference's pseudo-labeling semantics exactly:
* tokenizer: ``src/data_labeling/pseudo_labeler.py:12-43``
  (``tokenize_amharic_message``)
* BIO state machine: ``src/data_labeling/pseudo_labeler.py:45-158``
  (``pseudo_label_message``) — price rules (number + ብር lookahead,
  embedded-digit split, ዋጋ keyword), location gazetteer with greedy
  multi-token continuation, product gazetteer with descriptor continuation.

One documented extension beyond the reference rules (the reference's
pseudo-labeler never emits CONTACT_INFO; the label exists only in its
hand-labeled corpus, e.g. ``+251911123456`` at ``ner_trainer.py:259``):
a phone-shaped token rule emitting ``B-CONTACT_INFO``, applied before the
price rules so phone digits are not mislabeled as prices.

The walker is inherently sequential per message (cursor + lookahead), so it
runs as a per-row Python function *inside* Arrow-batched UDF calls — the
batch boundary is vectorized, the automaton is not expressible as column ops.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Gazetteers (data tables mirroring pseudo_labeler.py:92,122,125,141)
# ---------------------------------------------------------------------------

LOCATION_KEYWORDS: tuple[str, ...] = (
    "መገናኛ", "ለቡ", "ስሪ", "ኤም", "ሲቲ", "ሞል", "ታሜ", "ጋስ", "ህንፃ", "መዳህኒዓለም",
    "ቤተ/ክርስቲያን", "#ዛም_ሞል", "ቁ.1", "ቁ.2", "ቢሮ", "ቁጥር",
)

LOCATION_CONTEXT_WORDS: frozenset[str] = frozenset({"ፎቅ", "ፊት", "ለ", "ጎን", "ቢሮ", "ቁ."})

ENGLISH_PRODUCT_INDICATORS: frozenset[str] = frozenset({
    "product", "set", "machine", "maker", "blender", "stove", "pan", "humidifier",
    "cleaner", "bags", "brush", "lamp", "pad", "tape", "mop", "bottle", "air fryer",
    "knife", "oven", "grinder", "rack", "bowl", "tray", "dispenser", "massager",
    "cup", "crepe", "towel", "cap", "light", "corrector", "blanket", "shaper",
    "heater", "scrubber", "epilator", "vibrator", "slicer", "guard", "warmer",
    "clipper", "lunch", "steamer", "play mat", "massage", "bag", "diffuser",
    "spice", "container", "hair curler", "food storage", "diaper", "dumpling",
    "organizer", "charcoal burner", "bathroom set", "toilet", "dish washing gloves",
    "cookware", "mixer", "juicer", "nutties", "biscuits", "omelette", "waffles",
    "snacks", "aprons", "abacus", "nail", "thermometer", "tweezer", "scissor",
    "aspirator", "medicine dispenser", "tooth brush", "portable", "electric",
    "stainless steel", "silicon", "mini", "automatic", "rechargeable", "smart",
    "adjustable", "foldable", "multipurpose", "multinational", "luxury", "quality",
    "style", "expert",
})

AMHARIC_PRODUCT_INDICATORS: frozenset[str] = frozenset({
    "ምርጥ", "እቃ", "ልብስ", "ማሳጅ", "መፍጫ", "መቁረጫ", "ማድረቂያ", "ማጠቢያ", "ማስቀመጫ",
    "ድስት", "መጥበሻ", "ቢላ", "ሻወር", "ዳይፐር", "ማቅረቢያ", "ምድጃ", "ስቶቭ", "ማሰሮ",
    "መወልወያ", "መብራት", "ስብስብ", "ስላይስ", "ማሽን", "ክሬም", "ቡና", "እንቁላል", "ሊጥ",
    "ጁስ", "አትክልት", "ስጋ", "ቦርጭ", "ፀጉር", "ፂም", "መቆረጪያ", "ቶንዶስ", "አማራጭ",
    "ብርጭቆ", "ሙቀት", "ምጣድ", "መጭመቂያ", "የጽዳት", "እንጨት", "መደርደሪያ",
})

PRODUCT_DESCRIPTORS: frozenset[str] = frozenset({
    "high", "quality", "new", "original", "style", "luxury", "portable", "electric",
    "stainless", "steel", "silicon", "mini", "automatic", "rechargeable", "smart",
    "adjustable", "foldable", "multipurpose", "multinational", "excellent", "durable",
    "best", "smooth", "effective", "waterproof", "ceramic", "glass", "bamboo",
    "wooden", "flexible", "long", "handled", "dual", "single", "multi-function",
    "set", "pcs", "pack", "in",
})

PRICE_TRIGGERS: frozenset[str] = frozenset({"ዋጋ", "ዋጋ፦", "ዋጋ:-", "price-"})

_NUM_RE = re.compile(r"^\d[\d,\.]*$")
_LOC_KW_RE = re.compile("|".join(re.escape(k) for k in LOCATION_KEYWORDS))
_HAS_DIGIT_RE = re.compile(r"\d")
_NUM_SPLIT_RE = re.compile(r"(\d[\d,\.]*)")
_TOKEN_RE = re.compile(r"\b\w+\b|[.,;!?#@%/:-]")
_WORD_OR_PUNCT_SPLITTERS = re.compile(r"[:\-]")
# extension rule: Ethiopian phone shapes; '+' is stripped by the tokenizer so
# accept both bare and '+'-prefixed international form plus local 09xxxxxxxx
_PHONE_RE = re.compile(r"^(?:\+?2519\d{8}|09\d{8})$")


def tokenize_message(message: str) -> list[str]:
    """Messaging-oriented tokenizer (pseudo_labeler.py:12-43 semantics):
    word/punct findall, then splitting of glued ``<num>ብር``, ``ዋጋ:-<num>``
    and ``<a>x<b>`` dimension tokens."""
    message = message.replace("፦", ":").replace("•", "")
    out: list[str] = []
    for token in _TOKEN_RE.findall(message):
        if "ብር" in token and len(token) > 2:
            head, _, _tail = token.partition("ብር")
            if head:
                out.append(head)
            out.append("ብር")
        elif "ዋጋ" in token and ":" in token:
            parts = _WORD_OR_PUNCT_SPLITTERS.split(token)
            out.append(parts[0])
            out.extend(p for p in parts[1:] if p)
        elif "x" in token and (token.replace("x", "").isdigit()
                               or any(c.isalpha() for c in token.replace("x", ""))):
            parts = token.split("x")
            out.append(parts[0])
            out.append("x")
            if parts[1]:
                out.append(parts[1])
        else:
            out.append(token)
    return [t for t in out if t.strip()]


def _is_num(tok: str) -> bool:
    return _NUM_RE.match(tok) is not None


def label_tokens(tokens: list[str], with_contact_rule: bool = True) -> list[tuple[str, str]]:
    """BIO-label a token sequence; returns [(token, label)].

    Mirrors pseudo_label_message (pseudo_labeler.py:45-158) rule-for-rule;
    the phone rule is the documented extension (off via with_contact_rule).
    Note the embedded-digit price rule consults the *accumulated* output
    sequence (reference :67), so labels can depend on the previous emission —
    preserved here.
    """
    seq: list[tuple[str, str]] = []
    n = len(tokens)
    lows = [t.lower() for t in tokens]  # one lower() per token, reused below
    i = 0
    while i < n:
        tok = tokens[i]
        low = lows[i]

        # Rule 0 (extension): phone-shaped token → contact info
        if with_contact_rule and _PHONE_RE.match(tok):
            seq.append((tok, "B-CONTACT_INFO"))
            i += 1
            continue

        # Rule 1a: bare number followed by 'ብር'
        if _is_num(tok) and i + 1 < n and lows[i + 1] == "ብር":
            seq.append((tok, "B-PRICE"))
            seq.append((tokens[i + 1], "I-PRICE"))
            i += 2
            continue

        # Rule 1b: glued digits+'ብር' inside one token (e.g. '550ብር')
        if "ብር" in low and _HAS_DIGIT_RE.search(tok):
            for piece in _NUM_SPLIT_RE.split(tok):
                if not piece:
                    continue
                if _is_num(piece):
                    starts = not seq or seq[-1][1] == "O"
                    seq.append((piece, "B-PRICE" if starts else "I-PRICE"))
                elif piece.lower() == "ብር":
                    seq.append((piece, "I-PRICE"))
                else:
                    seq.append((piece, "O"))
            i += 1
            continue

        # Rule 1c: price trigger word, with number (+ 'ብር') lookahead
        if low in PRICE_TRIGGERS:
            seq.append((tok, "B-PRICE"))
            i += 1
            if i < n and _is_num(tokens[i]):
                seq.append((tokens[i], "I-PRICE"))
                i += 1
                if i < n and lows[i] == "ብር":
                    seq.append((tokens[i], "I-PRICE"))
                    i += 1
            continue

        # Rule 2: location gazetteer hit (substring — one compiled
        # alternation scan, equivalent to any(kw in tok)) + greedy
        # continuation (with the contact extension on, phone-shaped tokens
        # terminate the run instead of being consumed as location numbers)
        if _LOC_KW_RE.search(tok):
            j = i
            run: list[str] = []
            while j < n:
                cur = tokens[j]
                if with_contact_rule and _PHONE_RE.match(cur):
                    break
                if (_LOC_KW_RE.search(cur) or _is_num(cur)
                        or lows[j] in LOCATION_CONTEXT_WORDS):
                    run.append(cur)
                    j += 1
                else:
                    break
            if run:
                seq.append((run[0], "B-LOC"))
                seq.extend((t, "I-LOC") for t in run[1:])
                i = j
                continue

        # Rule 3: product gazetteer hit (exact lower match) + descriptor run
        if low in ENGLISH_PRODUCT_INDICATORS or low in AMHARIC_PRODUCT_INDICATORS:
            j = i + 1
            run = [tok]
            while j < n:
                nxt = lows[j]
                if with_contact_rule and _PHONE_RE.match(tokens[j]):
                    break
                if (nxt in ENGLISH_PRODUCT_INDICATORS or nxt in AMHARIC_PRODUCT_INDICATORS
                        or _is_num(tokens[j]) or nxt in PRODUCT_DESCRIPTORS):
                    run.append(tokens[j])
                    j += 1
                else:
                    break
            seq.append((run[0], "B-PRODUCT"))
            seq.extend((t, "I-PRODUCT") for t in run[1:])
            i = j
            continue

        seq.append((tok, "O"))
        i += 1
    return seq


# ---------------------------------------------------------------------------
# Entity grouping + price parsing (notebook-03 semantics)
# ---------------------------------------------------------------------------

_PRICE_STRIP_RE = re.compile(r"[ብርbirr\s,]")  # charclass per notebook 03 cell 11


def parse_price(phrase: str) -> float | None:
    """Price phrase → float; strips the {ብ,ር,b,i,r,whitespace,comma} charclass
    then float()s, None (SQL null ≙ NaN) on failure — notebook 03 cell 11
    ``extract_numerical_price``."""
    cleaned = _PRICE_STRIP_RE.sub("", phrase.lower())
    try:
        return float(cleaned)
    except ValueError:
        return None


def group_entities(labeled: list[tuple[str, str]]) -> dict[str, list[str]]:
    """Collapse a BIO sequence into per-type entity phrases (space-joined
    contiguous runs). A run starts at B-X or at an I-X that does not continue
    a run of the same type; unknown/corrupted labels count as O (SURVEY.md
    Appendix A, corrupted ``I-LOCገ`` handling)."""
    out: dict[str, list[str]] = {"PRODUCT": [], "PRICE": [], "LOC": [], "CONTACT_INFO": []}
    cur_type: str | None = None
    cur_tokens: list[str] = []

    def flush() -> None:
        nonlocal cur_type, cur_tokens
        if cur_type is not None and cur_tokens:
            out[cur_type].append(" ".join(cur_tokens))
        cur_type, cur_tokens = None, []

    for tok, label in labeled:
        if label.startswith(("B-", "I-")):
            etype = label[2:]
            if etype not in out:
                flush()
                continue
            if label.startswith("B-") or etype != cur_type:
                flush()
                cur_type = etype
            cur_tokens.append(tok)
        else:
            flush()
    flush()
    return out


def extract_message(text: str, with_contact_rule: bool = True) -> dict[str, list]:
    """text → per-message entity record: the per-row kernel the Spark
    extraction operator maps over Arrow batches.

    Returns dict with products/prices/locations/contacts (list[str] phrases)
    and price_values (list[float], nulls dropped — notebook 03
    ``all_numerical_prices``).
    """
    tokens = tokenize_message(text) if text else []
    labeled = label_tokens(tokens, with_contact_rule=with_contact_rule)
    ents = group_entities(labeled)
    price_values = [v for v in (parse_price(p) for p in ents["PRICE"]) if v is not None]
    return {
        "tokens": [t for t, _ in labeled],
        "labels": [l for _, l in labeled],
        "products": ents["PRODUCT"],
        "prices": ents["PRICE"],
        "locations": ents["LOC"],
        "contacts": ents["CONTACT_INFO"],
        "price_values": price_values,
    }
