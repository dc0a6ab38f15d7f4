"""PDF object tree + typed ensure() downcasts (SURVEY.md §1.1, §2.2 V8).

The reference models objects as a recursive enum with per-node byte
offsets plus typed wrappers with ``ensure()`` downcasts that turn type
mismatches into positioned errors (/root/reference/src/object.rs:64-575).

Here an object is a plain tuple ``(tag, value, byte_offset)`` — cheap to
build per document inside a UDF, never crosses an Arrow block boundary:

    ("bool",   bool,                 off)
    ("int",    int,                  off)
    ("real",   float,                off)
    ("name",   str,                  off)
    ("string", bytes,                off)   # literal AND hex strings
    ("array",  list[obj],            off)
    ("null",   None,                 off)
    ("ref",    (obj_num, gen_num),   off)
    ("dict",   {name: obj},          off)
    ("iobj",   obj,                  off)   # indirect object wrapper
    ("stream", dict_obj,             off)   # off = stream data start offset
"""

from __future__ import annotations

from .errors import ObjectError

TAG = 0
VAL = 1
OFF = 2

_TYPE_NAMES = {
    "bool": "boolean",
    "int": "integer",
    "real": "real",
    "name": "name",
    "string": "string",
    "array": "array",
    "null": "null",
    "ref": "indirect ref",
    "dict": "dictionary",
    "iobj": "indirect object",
    "stream": "stream object",
}


def type_missmatch_error(tag: str, byte_offset: int) -> ObjectError:
    # message mirrors src/object.rs Display ("missmatch" sic)
    return ObjectError(
        f"object type missmatch: required `{_TYPE_NAMES[tag]}`", byte_offset
    )


def ensure(obj: tuple, tag: str) -> tuple:
    """Downcast: return ``obj`` if tagged ``tag`` else positioned error.

    Mirrors the per-type ``ensure()`` impls (e.g. PdfInteger::ensure,
    src/object.rs:106-111).
    """
    if obj[TAG] != tag:
        raise type_missmatch_error(tag, obj[OFF])
    return obj


def ensure_int(obj):
    return ensure(obj, "int")


def ensure_name(obj):
    return ensure(obj, "name")


def ensure_array(obj):
    return ensure(obj, "array")


def ensure_ref(obj):
    return ensure(obj, "ref")


def ensure_iobj(obj):
    return ensure(obj, "iobj")


def ensure_stream(obj):
    return ensure(obj, "stream")


def ensure_dict(obj):
    return ensure(obj, "dict")


def assert_natural(int_obj) -> None:
    """src/object.rs:113-122 — value must be > 0."""
    if int_obj[VAL] <= 0:
        raise ObjectError(
            "value doesn't satisfy restriction: value isn't natural", int_obj[OFF]
        )


def assert_not_negative(int_obj) -> None:
    """src/object.rs:124-133 — value must be >= 0."""
    if int_obj[VAL] < 0:
        raise ObjectError(
            "value doesn't satisfy restriction: value isn't not negative",
            int_obj[OFF],
        )


def assert_with_key(dict_obj, keys) -> None:
    """src/object.rs:437-449 — required dict keys."""
    d = dict_obj[VAL]
    for key in keys:
        if key not in d:
            raise ObjectError(f"dictionary key `{key}` not found", dict_obj[OFF])


def ensure_dict_with_key(obj, keys):
    """src/object.rs:407-419 — dict downcast + required keys."""
    d = ensure_dict(obj)
    assert_with_key(d, keys)
    return d


def ensure_type(dict_obj, expected: str) -> None:
    """src/object.rs:421-435 — /Type name check (Q12: missing /Type is a
    caller-contract violation; the reference unwraps/panics, we raise)."""
    d = dict_obj[VAL]
    if "Type" not in d:
        raise ObjectError("dictionary key `Type` not found", dict_obj[OFF])
    type_obj = ensure_name(d["Type"])
    if type_obj[VAL] != expected:
        raise ObjectError(
            f"dictionary type missmatch: required `{expected}`, given `{type_obj[VAL]}`",
            dict_obj[OFF],
        )


def dict_get(dict_obj, key: str):
    return dict_obj[VAL].get(key)


def iobj_inner(iobj):
    return iobj[VAL]
