"""Device (CPU-backend) tests for the TPU normalize+encode pipeline.

The jitted programs are exact mirrors of the host paths; these tests pin
that equivalence on edge cases and corpus slices. The driver's bench runs
the same programs on real TPU hardware with a bit-exactness gate.
"""

import numpy as np
import pytest


EDGE = ["Hello World", "  lead", "trail  ", "  both  ", "", " ", "   ",
        "a  b", "double  space", "\tTab\tx", "▁literal", "x▁", "▁",
        "ＡＢＣ １２３", "ｶﾀｶﾅ", "Å Å", "à combine",
        b"bad\xffbyte".decode("utf8", "surrogateescape"),
        b"\x80start".decode("utf8", "surrogateescape"),
        "㍿ company", "mixed ▁ and  spaces ", "№5 ¼ ½", " ▁ ", "don’t"]


def _norm_case(spec, suffix, lines):
    from sentencepiece_tpu.normalizer.normalize import Normalizer
    from sentencepiece_tpu.tpu.normalize import BatchNormalizer

    host = Normalizer(spec, treat_whitespace_as_suffix=suffix)
    dev = BatchNormalizer(spec, treat_whitespace_as_suffix=suffix)
    raw = [l.encode("utf-8", "surrogateescape") for l in lines]
    N = max(32, max((len(b) for b in raw), default=1))
    arr = np.zeros((len(raw), N), np.uint8)
    lens = np.zeros(len(raw), np.int32)
    for i, b in enumerate(raw):
        arr[i, :len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    out, total, n2o, early = dev.normalize(arr, lens, with_alignment=True)
    out, total, n2o, early = map(np.asarray, (out, total, n2o, early))
    for i, b in enumerate(raw):
        want, want_n2o = host.normalize(b)
        got = out[i, :total[i]].tobytes()
        assert want == got, (lines[i], want, got)
        # norm_to_orig byte alignment, same pass (normalizer.cc:88-211;
        # empty alignment on the empty-input / all-space early returns)
        got_n2o = ([] if (not b or early[i])
                   else n2o[i, :total[i] + 1].tolist())
        assert got_n2o == list(want_n2o), (lines[i], got_n2o,
                                           list(want_n2o))


@pytest.mark.parametrize("mutate", ["none", "suffix", "no_remove",
                                    "no_escape", "no_dummy", "identity"])
def test_device_normalizer_matches_host(mutate):
    from sentencepiece_tpu.proto.spec import NormalizerSpec
    from sentencepiece_tpu.train.facade import get_normalizer_spec

    suffix = mutate == "suffix"
    if mutate == "identity":
        spec = NormalizerSpec()
        spec.name = "identity"
    else:
        spec = get_normalizer_spec("nmt_nfkc")
        if mutate == "no_remove":
            spec.remove_extra_whitespaces = False
        elif mutate == "no_escape":
            spec.escape_whitespaces = False
        elif mutate == "no_dummy":
            spec.add_dummy_prefix = False
    _norm_case(spec, suffix, EDGE)


def test_normalize_with_offsets_corpus(botchan_path):
    """TpuTokenizer.normalize_with_offsets serves (normalized,
    norm_to_orig) device-side, equal to the host normalizer on a real
    corpus slice (EN + JA lines mixed)."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        str(__import__("pathlib").Path(__file__).parent / "fixtures"
            / "bpe_en_300.model"))
    tok = TpuTokenizer(sp)
    en = open(botchan_path, "rb").read().split(b"\n")[:160]
    ja = open("/root/reference/data/wagahaiwa_nekodearu.txt",
              "rb").read().split(b"\n")[:80]
    lines = [b.decode("utf-8", "surrogateescape")
             for b in en + ja if len(b) <= 256]
    res = tok.normalize_with_offsets(lines)
    for t, (s, align) in zip(lines, res):
        hb, hn = sp.normalizer.normalize(t)
        assert s == hb.decode("utf-8", "surrogateescape"), t
        assert align == list(hn), t


def test_device_normalizer_fast_path_per_row():
    """The chunk-chain fast path (normalize.py: fast_branch) dispatches
    per BATCH; single-row batches force each row through whichever
    branch its own content selects, pinning the simplicity predicate on
    adversarial byte patterns (stray continuation bytes after valid
    chars, truncated sequences, charsmap-matched chars)."""
    from sentencepiece_tpu.train.facade import get_normalizer_spec

    spec = get_normalizer_spec("nmt_nfkc")
    adversarial = [
        b"\xc3\xa9\xa9x",          # stray continuation after a valid char
        b"\xe2\x96\x81\xa9",       # stray continuation after 3-byte char
        b"a\xc3b",                 # truncated 2-byte sequence
        b"ab \xe2\x96q",           # truncated 3-byte sequence
        b"\xf0\x9f\x98\x80\x80",   # stray continuation after 4-byte char
        b"hello world  x ",        # pure fast path
        b"\xef\xac\x81nal",        # U+FB01 LATIN SMALL LIGATURE FI (match)
    ]
    lines = EDGE + [b.decode("utf-8", "surrogateescape")
                    for b in adversarial]
    for line in lines:
        _norm_case(spec, False, [line])
    # and one all-simple batch so the whole batch takes the fast branch
    _norm_case(spec, False, ["Hello World", "  lead", "trail  ",
                             "a  b", " ", "", "don't stop", "x y  z "])


def test_pipeline_bit_exact_ja_unigram(fixtures_dir, wagahai_path):
    """JA through the FULL device pipeline (charsmap scan branch + deep
    trie walks) vs the committed reference spm_encode golden
    (tests/fixtures/unigram_ja.ids.txt, model test_ja_model.model)."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_ja_model.model")
    tok = TpuTokenizer(sp)
    raw = open(wagahai_path, "rb").read().split(b"\n")
    if raw and raw[-1] == b"":
        raw.pop()
    keep = [i for i, l in enumerate(raw) if len(l) <= 512][:400]
    gold = [list(map(int, l.split())) if l else []
            for l in open(fixtures_dir / "unigram_ja.ids.txt").read()
            .splitlines()]
    dev = tok.encode([raw[i].decode("utf-8", "surrogateescape")
                      for i in keep])
    bad = sum(1 for j, i in enumerate(keep) if dev[j] != gold[i])
    assert bad == 0


def test_device_normalizer_long_rows():
    """Regression: the packed (offset, kind, src) chunk word used a
    FIXED 9-bit offset field, silently corrupting any row whose
    normalized output passed 511 bytes (first corpus-visible in wide
    buckets). Field widths are now static from n_out."""
    import numpy as np
    from sentencepiece_tpu.train.facade import get_normalizer_spec
    from sentencepiece_tpu.normalizer.normalize import Normalizer
    from sentencepiece_tpu.tpu.normalize import BatchNormalizer

    spec = get_normalizer_spec("nmt_nfkc")
    host = Normalizer(spec)
    dev = BatchNormalizer(spec)
    for L, W in [(700, 704), (1500, 1504)]:
        line = (b"word stuff things " * 200)[:L]
        arr = np.zeros((1, W), np.uint8)
        arr[0, :L] = np.frombuffer(line, np.uint8)
        out, total = dev.normalize(arr, np.asarray([L], np.int32))
        got = np.asarray(out)[0, :int(total[0])].tobytes()
        assert got == host.normalize(line)[0], L


def test_pipeline_long_lines_bit_exact():
    """Long lines (wide buckets, normalized output far past 511 bytes)
    through the full device pipeline vs the host processor."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    texts = ["the quick brown fox jumps over the lazy dog " * 16,
             "a " * 300, "supercalifragilistic " * 20]
    dev = tok.encode(texts)
    for t, d in zip(texts, dev):
        assert d == sp.encode_as_ids(t), t[:40]


@pytest.mark.parametrize("model", [
    "/root/reference/python/test/test_model.model",   # unigram
    "FIX/bpe_en_300.model",                           # bpe
    "FIX/word_ja_900.model",                          # word
    "FIX/char_ja_400.model",                          # char
])
def test_pipeline_fuzz_random_bytes(model, fixtures_dir):
    """Seeded fuzz: random byte soup (malformed UTF-8, space runs,
    meta/boundary chars, long rows) through the full device pipeline
    must match the host processor exactly, for all four model types.
    This class of input found the 9-bit packed-offset bug the corpora
    missed."""
    import numpy as np
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    rng = np.random.default_rng(20260818)
    sp = SentencePieceProcessor(model.replace("FIX", str(fixtures_dir)))
    tok = TpuTokenizer(sp)
    alphabet = (list(b"abcdefgh THE the.,!?") + [0x09, 0x0A, 0x0D, 0x00]
                + [0xE2, 0x96, 0x81, 0xC3, 0xA9, 0xEF, 0xBF, 0x80, 0xFF,
                   0xF0, 0x9F, 0x98, 0x80])
    texts = []
    for _ in range(120):
        n = int(rng.integers(0, 120))
        texts.append(bytes(rng.choice(alphabet, n).astype(np.uint8))
                     .decode("utf-8", "surrogateescape"))
    if model.endswith("test_model.model"):
        # long rows (wide buckets) only for the headline model — each
        # extra bucket is a fresh multi-minute compile on cold caches
        texts += ["x" * 600, ("a b" * 250), "▁" * 120]
    dev = tok.encode(texts)
    bad = [(i, t[:40]) for i, (t, d) in enumerate(zip(texts, dev))
           if d != sp.encode_as_ids(t)]
    assert not bad, bad[:3]


def test_pick_enc_width():
    """The host-side normalized-length bound: exact-or-over for
    match-free rows, capped for pathological ones, sane on empties."""
    import numpy as np
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer, pack_lines

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    host = sp.normalizer

    def bound_holds(lines, n_in):
        arr, lens = pack_lines(lines, n_in)
        w = tok.pick_enc_width(arr, lens, n_in)
        assert w <= tok.enc_width(n_in)
        for l in lines:
            norm = host.normalize(
                l[:n_in].decode("utf-8", "surrogateescape"))[0]
            # rows above the bound must be the capped (host-fallback)
            # case; match-free rows must FIT
            if len(norm) > w:
                assert w == tok.enc_width(n_in), (l, len(norm), w)
        return w

    assert bound_holds([b"hello world", b"a b c", b""], 32) <= 64
    # space-heavy: hits the cap
    assert bound_holds([b" a" * 16], 32) == tok.enc_width(32)
    # malformed bytes count 3 output bytes each
    bound_holds([b"\xff" * 20, b"\xc3\xa9" * 10, b"\xe2\x96"], 32)
    # empty batch
    arr = np.zeros((0, 32), np.uint8)
    assert tok.pick_enc_width(arr, np.zeros(0, np.int32), 32) \
        == tok.enc_width(32)


def test_pipeline_matches_processor(botchan_path):
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    raw = open(botchan_path, "rb").read().split(b"\n")[:200]
    texts = [l.decode("utf-8", "surrogateescape") for l in raw if l]
    dev = tok.encode(texts)
    for t, d in zip(texts, dev):
        assert d == sp.encode_as_ids(t), t


def test_pipeline_extra_options():
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp, add_bos=True, add_eos=True, reverse=True)
    sp.set_encode_extra_options("reverse:bos:eos")
    texts = ["Hello world.", "I have a pen."]
    dev = tok.encode(texts)
    for t, d in zip(texts, dev):
        assert d == sp.encode_as_ids(t), t


def test_bpe_full_device_pipeline(fixtures_dir):
    """BPE TpuTokenizer runs normalize + utf8->cp + merge fully on device
    (utf8_to_cp_batch); ids match the host processor exactly."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    tok = TpuTokenizer(sp)
    lines = ["A cold day.", "", "  spaces  everywhere  ",
             "mixed ascii ＆ ｆｕｌｌｗｉｄｔｈ", "tails"]
    assert tok.encode(lines) == [sp.encode_as_ids(l) for l in lines]


def test_device_kbest_matches_host_nbest():
    """unigram_nbest_batch (k-best Viterbi scan) returns the same path set
    and scores as the host A* nbest (tie ORDER is impl-defined on device;
    host nbest remains the tie-exact path)."""
    import jax.numpy as jnp
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer
    from sentencepiece_tpu.tpu import encode as E

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    enc = tok.enc
    for text in ("hello", "worlds"):
        normalized, _ = sp.normalizer.normalize(text)
        host = sp.model.nbest_encode(normalized, 6)
        hostset = sorted(((tuple(pid for _, pid in res), round(sc, 4))
                          for res, sc in host))
        arr = np.zeros((8, 128), np.uint8)
        lens = np.zeros(8, np.int32)
        arr[0, :len(normalized)] = np.frombuffer(normalized, np.uint8)
        lens[0] = len(normalized)
        rev, nt, scores, valid = E.unigram_nbest_batch(
            enc.units, enc.lat_score_table, jnp.asarray(arr),
            jnp.asarray(lens), enc.unk_score, max_depth=enc.max_depth,
            unk_id=enc.unk_id, k=6, root_state=enc.root_state)
        rev, nt, scores, valid = map(np.asarray, (rev, nt, scores, valid))
        devset = sorted(((tuple(int(x) for x in rev[0, r, :nt[0, r]][::-1]),
                          round(float(scores[0, r]), 4))
                         for r in range(6) if valid[0, r]))
        assert hostset == devset


def test_device_nbest_sampling_distribution():
    """TpuTokenizer.sample_encode(nbest_size>1) draws from
    softmax(alpha * score) over the n-best like the host dispatch."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    text = "hello"
    S = 1200
    hr = np.random.default_rng(1)
    host = {}
    for _ in range(S):
        kk = tuple(sp.sample_encode_as_ids(text, 5, 0.7, rng=hr))
        host[kk] = host.get(kk, 0) + 1
    dev = {}
    for o in tok.sample_encode([text] * S, 5, 0.7,
                               rng=np.random.default_rng(2)):
        dev[tuple(o)] = dev.get(tuple(o), 0) + 1
    for kk in set(host) | set(dev):
        p, q = host.get(kk, 0) / S, dev.get(kk, 0) / S
        sig = (max(p * (1 - p), 1e-4) / S) ** 0.5
        assert abs(p - q) < 5 * sig + 2 / S, (kk, p, q)


def test_mesh_sharded_encode():
    """TpuTokenizer(mesh=...) shards batch rows over a device mesh (pure
    data parallelism — XLA partitions the pipeline, zero collectives);
    ids identical to the host processor."""
    import jax
    from jax.sharding import Mesh
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device backend")
    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    tok = TpuTokenizer(sp, mesh=mesh)
    lines = ["Hello world.", "I have a pen.", "", "ＡＢＣ ﾃｽﾄ", "x" * 200]
    assert tok.encode(lines) == [sp.encode_as_ids(t) for t in lines]


def test_per_row_sampling_parameters():
    """One batch mixing deterministic, lattice-sampled, and n-best rows
    with PER-ROW nbest_size/alpha — the TF op's per-row attribute
    resolution (sentencepiece_processor_ops.cc:244-305)."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    texts = ["I have a pen.", "hello world", "this is a test",
             "I have a pen.", "the quick brown fox", "a b c"]
    nbest = [0, -1, 5, 1, -1, 8]
    alpha = [0.0, 0.5, 0.7, 0.0, 0.2, 0.9]
    out = tok.sample_encode(texts, nbest, alpha,
                            rng=np.random.default_rng(7))
    # deterministic rows are exactly the Encode result
    assert out[0] == sp.encode_as_ids(texts[0])
    assert out[3] == sp.encode_as_ids(texts[3])
    # sampled rows decode back (lossless) and are valid segmentations
    for i in (1, 2, 4, 5):
        assert out[i] and sp.decode_ids(out[i]) == texts[i]
    # different alphas on the same text must be able to diverge: alpha
    # near 0 ~ uniform over paths, high alpha ~ Viterbi. Statistically:
    # sample row "hello world" many times at alpha=5 -> mostly the
    # Viterbi ids.
    many = tok.sample_encode(["hello world"] * 50, -1, 5.0,
                             rng=np.random.default_rng(8))
    vit = sp.encode_as_ids("hello world")
    assert sum(1 for m in many if m == vit) > 25


def test_per_row_alpha_distribution():
    """Per-row alphas in ONE dispatch reproduce the per-alpha host
    distributions (row independence of the vectorized theta)."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    text = "hello"
    S = 800
    # one batch: S rows at alpha=0.3 interleaved with S rows at alpha=3.0
    texts = [text] * (2 * S)
    alphas = [0.3, 3.0] * S
    out = tok.sample_encode(texts, -1, alphas,
                            rng=np.random.default_rng(3))
    lo = [tuple(out[i]) for i in range(0, 2 * S, 2)]
    hi = [tuple(out[i]) for i in range(1, 2 * S, 2)]
    vit = tuple(sp.encode_as_ids(text))
    p_lo = sum(1 for o in lo if o == vit) / S
    p_hi = sum(1 for o in hi if o == vit) / S
    # host references for the two alphas
    hr = np.random.default_rng(4)
    h_lo = sum(1 for _ in range(S) if tuple(
        sp.sample_encode_as_ids(text, -1, 0.3, rng=hr)) == vit) / S
    h_hi = sum(1 for _ in range(S) if tuple(
        sp.sample_encode_as_ids(text, -1, 3.0, rng=hr)) == vit) / S
    assert abs(p_lo - h_lo) < 0.12
    assert abs(p_hi - h_hi) < 0.12
    assert p_hi > p_lo + 0.2  # the rows really got different alphas


def test_device_nbest_byte_exact_order():
    """TpuTokenizer.nbest_encode returns the host n-best ids in the
    host's ORDER (VERDICT r4 item 10): device k-best set + host
    float-chain rescoring; rows with exact score ties fall back to the
    tie-exact host path, so the output is byte-exact by construction."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer

    sp = SentencePieceProcessor(
        "/root/reference/python/test/test_model.model")
    tok = TpuTokenizer(sp)
    raw = open("/root/reference/data/botchan.txt", "rb").read()
    lines = [ln.decode("utf-8", "surrogateescape")
             for ln in raw.split(b"\n") if 0 < len(ln) <= 96][:64]
    for n in (2, 5):
        dev = tok.nbest_encode(lines, n)
        host = [[list(map(int, p))
                 for p in sp.nbest_encode_as_ids(t, n)] for t in lines]
        bad = [i for i in range(len(lines)) if dev[i] != host[i]]
        assert not bad, (n, len(bad), bad[:3],
                         (dev[bad[0]], host[bad[0]]) if bad else None)


def test_fuzz_restricted_bpe_and_char_user(fixtures_dir, tmp_path):
    """Seeded fuzz for the r5 device paths: set_vocabulary-restricted
    BPE (per-row rev_merge flag -> host fallback) and char models with
    user-defined symbols (user-span coverage). Random byte soup plus
    user-symbol fragments must match the host processor exactly."""
    import numpy as np
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.proto.spec import PieceType
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer
    from sentencepiece_tpu.train import facade

    rng = np.random.default_rng(20260821)
    alphabet = (list(b"abcdefgh THE the.,!?<sep>") + [0x09, 0x0A, 0x0D]
                + [0xE2, 0x96, 0x81, 0xC3, 0xA9, 0xEF, 0xBF, 0x80, 0xFF,
                   0xE2, 0x91, 0xA0])  # ① bytes
    texts = []
    for _ in range(100):
        n = int(rng.integers(0, 100))
        texts.append(bytes(rng.choice(alphabet, n).astype(np.uint8))
                     .decode("utf-8", "surrogateescape"))
    texts += ["<sep>", "a<sep>b ① c", "<sep><sep>①①", ""]

    # restricted BPE
    sp = SentencePieceProcessor(str(fixtures_dir / "bpe_en_300.model"))
    keep = [sp.id_to_piece(i) for i in range(len(sp))
            if len(sp.id_to_piece(i)) <= 2]
    sp.set_vocabulary(keep)
    assert (sp.model.types == PieceType.UNUSED).any()
    tok = TpuTokenizer(sp)
    assert not tok._bpe.host_only
    bad = [(i, t[:30]) for i, (t, d) in
           enumerate(zip(texts, tok.encode(texts)))
           if d != sp.encode_as_ids(t)]
    assert not bad, bad[:3]

    # char + user
    facade.train(
        f"--input={fixtures_dir / 'user_test_corpus.txt'} "
        "--model_type=char --vocab_size=200 --hard_vocab_limit=false "
        "--minloglevel=2 --user_defined_symbols=<sep>,① "
        f"--model_prefix={tmp_path}/cu")
    spc = SentencePieceProcessor(str(tmp_path / "cu.model"))
    tokc = TpuTokenizer(spc)
    assert tokc._span is not None and not tokc._span.host_only
    bad = [(i, t[:30]) for i, (t, d) in
           enumerate(zip(texts, tokc.encode(texts)))
           if d != spc.encode_as_ids(t)]
    assert not bad, bad[:3]
