#!/usr/bin/env python3
"""Generate CPython ground-truth cases for the graft fuzz harnesses.

Writes /tmp/url_cases.json, /tmp/key_cases.json, /tmp/g6_cases.json,
/tmp/sent_cases.json; then run:
  sbt "runMain graft.UrlFuzz"   # CanonicalUrl vs urlsplit semantics
  sbt "runMain graft.KeyFuzz"   # event keys + %.6g vs hashlib/printf
  sbt "runMain graft.SentFuzz"  # lexicon sentiment vs analyze_rules

The expected values come from Python stdlib re-implementations of the
reference semantics (urllib.parse / hashlib / f-string formatting) —
behavioral ground truth, no reference code imported.
"""
import hashlib
import json
import random
import re
import struct
from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode


def gen_urls():
    def norm(url):
        if not url or not isinstance(url, str):
            return None
        try:
            parts = urlsplit(url.strip())
            scheme = ("https" if parts.scheme in ("http", "https", "")
                      else parts.scheme.lower())
            host = parts.hostname or ""
            try:
                host_puny = host.encode("idna").decode("ascii") if host else host
            except Exception:
                host_puny = host.lower()
            port = parts.port
            netloc = host_puny
            if port and not ((scheme == "http" and port == 80) or
                             (scheme == "https" and port == 443)):
                netloc = f"{host_puny}:{port}"
            q = []
            for k, v in parse_qsl(parts.query, keep_blank_values=True):
                kl = (k or "").lower()
                if kl.startswith("utm_") or kl in ("ref", "ref_src"):
                    continue
                q.append((kl, v))
            q.sort()
            query = urlencode(q, doseq=True)
            path = parts.path or "/"
            if path != "/":
                path = re.sub(r"/+$", "", path)
            return urlunsplit((scheme, netloc, path, query, ""))
        except Exception:
            return url

    random.seed(7)
    schemes = ["http://", "https://", "HTTP://", "", "ftp://", "wss://"]
    hosts = ["Example.com", "a-b.x.io", "MÜNCHEN.de", "sub.Example.COM", "127.0.0.1"]
    ports = ["", ":80", ":443", ":8080", ":0", ":99999", ":notaport"]
    paths = ["", "/", "/p", "/p/q/", "/p//q///", "/x%20y"]
    queries = ["", "?a=1&b=2", "?utm_s=1&REF=x&z=9", "?b&a=",
               "?ref_src=tw&B=2&a=10", "?a=1&a=0",
               # percent/plus round-trips: parse_qsl decodes, urlencode
               # re-encodes with quote_plus ('a=b%20c' → 'a=b+c')
               "?a=b%20c&x=y+z", "?A%20B=c%2Dd&q=%C3%A9",
               "?%75tm_source=1&ok=1", "?R%45F=x&keep=2",
               "?bad=%zz&tail=%4", "?raw=%ff%fe", "?a%3Db=c",
               "?s=%e4%b8%ad%e6%96%87", "?k=a%26b&k=a%3D1",
               "?sp%2Bace=pl+us", "?Mixed%2FCase=V%7Ea%2Cl"]
    frags = ["", "#f"]
    cases = [random.choice(schemes) + random.choice(hosts) + random.choice(ports)
             + random.choice(paths) + random.choice(queries) + random.choice(frags)
             for _ in range(400)]
    cases += ["", "   ", "::::", "http://[half", "example.com/x",
              "http://user:pw@Host.com:8080/p?b=1"]
    json.dump([(c, norm(c)) for c in cases],
              open("/tmp/url_cases.json", "w"), ensure_ascii=False)


def gen_keys_and_g6():
    random.seed(13)
    types = ["x", "LISTING", "Mention", "rug_alert", ""]
    symbols = ["$pepe", "$doge", "$wif", "", None]
    cas = ["0x" + "ab" * 20, "0x" + "42" * 20, "", None]
    chains = ["eth", "bsc", "na", None]
    texts = ["pepe launch", "", "total rug avoid now", "gm gm gm"]
    keys = []
    for _ in range(200):
        t = random.choice(types); sym = random.choice(symbols)
        ca = random.choice(cas); ch = random.choice(chains)
        txt = random.choice(texts)
        bucket = 1700000000 + random.randint(0, 1000) * 600
        topic = random.choice(["", "aabbccddeeff"])
        salt = random.choice(["v1", "rotated"])
        symu = (sym.upper() if sym else "")
        pre1 = f"{t.lower()}|{symu}|{(ca or '').lower()}|{txt}|{bucket}|{salt}"
        v1 = hashlib.sha256(pre1.encode()).hexdigest()[:40]
        identity = (ca or "").lower() or f"{sym if sym else ''}|{ch if ch else ''}"
        sig = hashlib.blake2s(txt.encode()).hexdigest()[:16]
        pre2 = f"v2|{t.lower()}|{identity}|{topic}|{bucket}|{sig}"
        v2 = hashlib.blake2s(pre2.encode(), key=salt.encode()).hexdigest()[:40]
        keys.append([t, sym, ca, ch, txt, topic, bucket, salt, v1, v2])
    json.dump(keys, open("/tmp/key_cases.json", "w"))

    vals = []
    for _ in range(3000):
        v = random.random() * (10 ** random.randint(-12, 12)) * random.choice([1, -1])
        vals.append([struct.pack('>d', v).hex(), f"{v:.6g}"])
    for v in [0.0, -0.0, 1e-300, -1e300, 2 ** -1022]:
        vals.append([struct.pack('>d', v).hex(), f"{v:.6g}"])
    json.dump(vals, open("/tmp/g6_cases.json", "w"))


def gen_sentiment():
    def tokenize(text):
        return re.findall(r"\b\w+\b", text.lower())

    def analyze(text, pos, neg):
        toks = tokenize(text)
        p = sum(1 for t in toks if t in pos)
        n = sum(1 for t in toks if t in neg)
        if p + n == 0:
            return ("neu", 0.0)
        score = (p - n) / max(len(toks), 1)
        score = max(-1.0, min(1.0, score * 3))
        return ("pos" if score > 0.1 else "neg" if score < -0.1 else "neu", score)

    random.seed(99)
    pos = ["fast", "big", "spark", "join", "merge"]
    neg = ["slow", "small", "dup", "error", "scan"]
    vocab = pos + neg + ["the", "data", "run", "x1", "under_score"]
    puncts = ["", ",", "!", "...", ")", ":", ";"]
    cases = []
    for _ in range(500):
        k = random.randint(0, 12)
        words = [random.choice(vocab) + random.choice(puncts) for _ in range(k)]
        text = " ".join(words) if words else random.choice(["", "   ", "!!!"])
        label, score = analyze(text, set(pos), set(neg))
        cases.append([text, label, repr(score)])
    json.dump(cases, open("/tmp/sent_cases.json", "w"), ensure_ascii=False)


if __name__ == "__main__":
    gen_urls()
    gen_keys_and_g6()
    gen_sentiment()
    print("wrote /tmp/{url,key,g6,sent}_cases.json")
