"""Bit-exact replica of libaom's daala entropy encoder (od_ec_enc).

Used for round-trip localization: re-encode a decoded symbol sequence
with our CDF evolution; the first byte differing from the real tile
bytes marks the first symbol where our decode's (context, cdf-state)
diverged from the encoder's (= libaom's) model.
"""

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4


def _msb(v):
    return v.bit_length() - 1


class MsacEncoder:
    def __init__(self):
        self.low = 0
        self.rng = 0x8000
        self.cnt = -9
        self.precarry = []

    def _normalize(self, low, rng):
        d = 16 - rng.bit_length()
        c = self.cnt
        s = c + d
        if s >= 0:
            c += 16
            m = (1 << c) - 1
            if s >= 8:
                self.precarry.append((low >> c) & 0xFFFF)
                low &= m
                c -= 8
                m >>= 8
            self.precarry.append((low >> c) & 0xFFFF)
            s = c + d - 24
            low &= m
        self.low = (low << d) & ((1 << 64) - 1)
        self.rng = (rng << d) & 0xFFFF
        self.cnt = s

    def encode_symbol(self, icdf, sym, nsyms):
        """icdf: inverse cdf (decreasing, 15-bit), len >= nsyms-1."""
        n = nsyms - 1
        low = self.low
        r = self.rng
        fl = 32768 if sym == 0 else int(icdf[sym - 1])
        fh = int(icdf[sym]) if sym < n else 0
        if fl < 32768:
            u = (((r >> 8) * (fl >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
                + EC_MIN_PROB * (n - (sym - 1))
            v = (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
                + EC_MIN_PROB * (n - sym)
            low += r - u
            r = u - v
        else:
            r -= (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
                + EC_MIN_PROB * (n - sym)
        self._normalize(low, r)

    def encode_bool_prob(self, f, val):
        """f: 15-bit probability that val == 0."""
        low = self.low
        r = self.rng
        v = (((r >> 8) * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
            + EC_MIN_PROB
        if val:
            low += r - v
            r = v
        else:
            r -= v
        self._normalize(low, r)

    def done(self):
        l = self.low
        c = self.cnt
        s = 10
        m = 0x3FFF
        e = ((l + m) & ~m) | (m + 1)
        s += c
        out = list(self.precarry)
        if s > 0:
            n = (1 << (c + 16)) - 1
            while True:
                out.append((e >> (c + 16)) & 0xFFFF)
                e &= n
                s -= 8
                c -= 8
                n >>= 8
                if s <= 0:
                    break
        # carry propagation
        carry = 0
        res = bytearray(len(out))
        for i in range(len(out) - 1, -1, -1):
            v = out[i] + carry
            res[i] = v & 0xFF
            carry = v >> 8
        return bytes(res)
