from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.transcripts import Blake2bTranscript


def test_deterministic_and_order_sensitive():
    t1 = Blake2bTranscript(b"test")
    t2 = Blake2bTranscript(b"test")
    t1.append_u64(5)
    t2.append_u64(5)
    assert t1.state == t2.state
    c1, c2 = t1.challenge_scalar(), t2.challenge_scalar()
    assert c1 == c2
    t3 = Blake2bTranscript(b"test")
    t3.append_u64(6)
    assert t3.state != t1.state


def test_label_padding_and_round_counter():
    # distinct labels -> distinct states; challenges advance the state
    a = Blake2bTranscript(b"a")
    b = Blake2bTranscript(b"b")
    assert a.state != b.state
    s0 = a.state
    a.challenge_bytes32()
    assert a.state != s0
    assert a.n_rounds == 1
    assert len(a.state_history) == 2


def test_challenge_scalar_is_128_bits():
    t = Blake2bTranscript(b"bits")
    for _ in range(50):
        c = t.challenge_scalar()
        assert c.v < (1 << 128)


def test_optimized_challenge_semantics():
    t1 = Blake2bTranscript(b"opt")
    t2 = Blake2bTranscript(b"opt")
    u = t2.challenge_u128()
    c = t1.challenge_scalar_optimized()
    masked = u & ((1 << 125) - 1)
    assert (c * Fr(1 << 128)).v == masked


def test_append_scalars_vector_markers():
    # appending [a, b] as a vector differs from appending raw scalars
    t1 = Blake2bTranscript(b"v")
    t2 = Blake2bTranscript(b"v")
    xs = [Fr(3), Fr(4)]
    t1.append_scalars(xs)
    for x in xs:
        t2.append_scalar(x)
    assert t1.state != t2.state
    assert t1.n_rounds == 4  # begin + 2 scalars + end


def test_compare_to_lockstep_oracle():
    p = Blake2bTranscript(b"proof")
    p.append_u64(1)
    p.challenge_scalar()
    v = Blake2bTranscript(b"proof")
    v.compare_to(p)
    v.append_u64(1)
    v.challenge_scalar()  # matches -> no raise
    v2 = Blake2bTranscript(b"proof")
    v2.compare_to(p)
    try:
        v2.append_u64(2)
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_challenge_bytes_multi_block():
    t = Blake2bTranscript(b"long")
    out = t.challenge_bytes(48)
    assert len(out) == 48
    assert t.n_rounds == 2  # two 32-byte squeezes
