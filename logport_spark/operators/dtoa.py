"""Grisu2 double→shortest-decimal, matching the reference serializer's dtoa.

The envelope kernel re-serializes JSON-candidate lines' floats; the
reference engine serializes them through its vendored nlohmann::json
(json.hpp 3.10.5), whose dtoa is Grisu2 [Loitsch, "Printing Floating-Point
Numbers Quickly and Accurately with Integers", PLDI 2010] with
(alpha, gamma) = (-60, -32), a step-8 cached-powers table over decimal
exponents [-300, 324], and a %g-style fixed/scientific cutover at
[10^-5, 10^15). Python's repr is David Gay / Ryū-style SHORTEST
round-trip, which differs from Grisu2 in two observable ways (both found
by tests/test_envelope_differential.py before this module existed):

  * the fixed↔scientific cutover: repr stays fixed up to 1e16, Grisu2
    switches at 1e15 ("8738272447776776.0" vs "8.738272447776776e+15");
  * digit count: Grisu2 is not guaranteed shortest and emits one extra
    digit for ~0.05% of doubles ("-8.009837034532819e+16" where repr
    gives "-8.00983703453282e+16" — same double either way).

This is a from-the-paper reimplementation in pure Python big-int
arithmetic (the cached-powers table is COMPUTED at import — round-half-up
64-bit truncations of 10^k — and spot-verified against the published
constants in tests). It is differentially fuzzed against a g++-compiled
harness using the reference's own header on random and adversarial
doubles (tests/test_envelope_differential.py::test_dtoa_*).

Scale note: this runs only inside json_mid_udf's float slow path.
CPython's C json encoder renders floats via PyFloat_Type.tp_repr
directly (a float subclass __repr__ is NOT consulted — measured), so the
kernel instead detects floats at parse time (parse_float hook) and only
float-BEARING candidate docs take a pure-Python re-serialization; every
other doc keeps the C-speed encoder. The bench corpus's JSON lines are
int-valued, so the flagship hot path never enters this module.
"""

from __future__ import annotations

import struct

_ALPHA = -60
_MIN_DEC_EXP = -300
_DEC_STEP = 8

# %g cutover used by the reference serializer for double:
# fixed-point iff the decimal point position n satisfies MIN_EXP < n <= MAX_EXP
_MIN_EXP = -4
_MAX_EXP = 15

_U64 = (1 << 64) - 1


def _cached_power(k: int) -> tuple[int, int]:
    """Normalized 64-bit significand f and binary exponent e with
    f·2^e ≈ 10^k, f in [2^63, 2^64) — round-half-up, which reproduces the
    published Grisu table values exactly (verified in tests)."""
    if k >= 0:
        n = 10 ** k
        e = n.bit_length() - 64
        if e <= 0:
            return n << -e, e
        f = (n + (1 << (e - 1))) >> e
        if f >> 64:
            f >>= 1
            e += 1
        return f, e
    d = 10 ** (-k)
    x = 63 + d.bit_length()
    while True:
        f = (2 ** x * 2 + d) // (2 * d)
        if f >= 1 << 64:
            x -= 1
        elif f < 1 << 63:
            x += 1
        else:
            return f, -x


_POWERS = [_cached_power(k)
           for k in range(_MIN_DEC_EXP, 325, _DEC_STEP)]


def _get_cached_power(e: int) -> tuple[int, int, int]:
    """(f, e_c, k) such that alpha <= e_c + e + 64 <= gamma."""
    f = _ALPHA - e - 1
    k = (f * 78913 >> 18 if f >= 0 else -((-f) * 78913 >> 18)) + (f > 0)
    # C integer division truncates toward zero; Python >> floors — the
    # branch above reproduces truncation for negative f
    idx = (-_MIN_DEC_EXP + k + (_DEC_STEP - 1)) // _DEC_STEP
    cf, ce = _POWERS[idx]
    return cf, ce, _MIN_DEC_EXP + idx * _DEC_STEP


def _round(digits: list, dist: int, delta: int, rest: int, ten_k: int):
    while (rest < dist and delta - rest >= ten_k
           and (rest + ten_k < dist or dist - rest > rest + ten_k - dist)):
        digits[-1] -= 1
        rest += ten_k


def _digit_gen(mm_f: int, w_f: int, mp_f: int, e: int,
               decimal_exponent: int) -> tuple[list, int]:
    delta = mp_f - mm_f
    dist = mp_f - w_f
    one_f = 1 << -e
    p1 = mp_f >> -e
    p2 = mp_f & (one_f - 1)

    digits: list = []
    # integral part
    k = len(str(p1))
    pow10 = 10 ** (k - 1)
    n = k
    while n > 0:
        d, p1 = divmod(p1, pow10)
        digits.append(d)
        n -= 1
        rest = (p1 << -e) + p2
        if rest <= delta:
            decimal_exponent += n
            _round(digits, dist, delta, rest, pow10 << -e)
            return digits, decimal_exponent
        pow10 //= 10

    # fractional part
    m = 0
    while True:
        p2 *= 10
        d = p2 >> -e
        p2 &= one_f - 1
        digits.append(d)
        m += 1
        delta *= 10
        dist *= 10
        if p2 <= delta:
            break
    decimal_exponent -= m
    _round(digits, dist, delta, p2, one_f)
    return digits, decimal_exponent


def _grisu2(value: float) -> tuple[list, int]:
    """Digits + decimal exponent of a positive finite double."""
    bits = struct.unpack("<Q", struct.pack("<d", value))[0]
    E = bits >> 52
    F = bits & ((1 << 52) - 1)
    if E == 0:                               # denormal
        v_f, v_e = F, -1074
    else:
        v_f, v_e = F + (1 << 52), E - 1075

    # boundaries m± = midpoints to the neighbouring doubles
    lower_closer = F == 0 and E > 1
    mp_f, mp_e = 2 * v_f + 1, v_e - 1
    if lower_closer:
        mm_f, mm_e = 4 * v_f - 1, v_e - 2
    else:
        mm_f, mm_e = 2 * v_f - 1, v_e - 1

    # normalize m+ to 64 bits; shift m- and v to the same exponent
    shift = 64 - mp_f.bit_length()
    wp_f, wp_e = mp_f << shift, mp_e - shift
    wm_f = mm_f << (mm_e - wp_e)
    wv_f = v_f << (v_e - wp_e)

    cf, ce, ck = _get_cached_power(wp_e)

    def mul(f):  # diyfp::mul — round-half-up 128→64 truncation
        return (f * cf + (1 << 63)) >> 64

    e = wp_e + ce + 64
    M_minus = mul(wm_f) + 1
    w = mul(wv_f)
    M_plus = mul(wp_f) - 1
    return _digit_gen(M_minus, w, M_plus, e, -ck)


def _format(digits: list, decimal_exponent: int) -> str:
    """nlohmann format_buffer + append_exponent for double
    (min_exp=-4, max_exp=digits10=15)."""
    buf = "".join(chr(48 + d) for d in digits)
    k = len(buf)
    n = k + decimal_exponent
    if k <= n <= _MAX_EXP:
        return buf + "0" * (n - k) + ".0"
    if 0 < n <= _MAX_EXP:
        return buf[:n] + "." + buf[n:]
    if _MIN_EXP < n <= 0:
        return "0." + "0" * (-n) + buf
    mantissa = buf if k == 1 else buf[0] + "." + buf[1:]
    e = n - 1
    sign = "-" if e < 0 else "+"
    return f"{mantissa}e{sign}{abs(e):02d}"


def nlohmann_repr(value: float) -> str:
    """Serialize a finite double exactly as nlohmann::json::dump() does."""
    if value == 0.0:
        # signbit, not <0: -0.0 keeps its sign
        return "-0.0" if struct.pack("<d", value)[7] & 0x80 else "0.0"
    sign = ""
    if value < 0.0:
        sign = "-"
        value = -value
    digits, dec_exp = _grisu2(value)
    # grisu2_round may step a digit below '0' only if the invariant broke;
    # the reference asserts buf[len-1] != '0' before decrementing
    return sign + _format(digits, dec_exp)
