"""Parameter-count derivations for all 25 zoo models.

Each function computes the expected parameter count of one model by
mirroring the *reference's* layer arithmetic (reference model.py, cited
per function) with standard Keras counting rules — NOT by instantiating
our flax modules. This gives an independent check that every flax
re-design is architecture-equivalent to the Keras original
(VERDICT round-1, missing item #3).

Counting rules (what our flax ``params`` collection holds):

  * Conv1D(k, cin->cout):      k*cin*cout (+ cout if use_bias)
  * DepthwiseConv1D(k, cin):   k*cin      (+ cin if use_bias)
  * Conv2D(kh, kw, cin->cout): kh*kw*cin*cout (+ cout)
  * Dense(cin->cout):          cin*cout   (+ cout)
  * BatchNorm(c):              2c   — scale+bias live in params; the
      moving mean/var live in flax ``batch_stats``. (Keras "Total
      params" would add another 2c of non-trainable stats per BN.)
  * GRU(cin, units), Keras 2.1.2 reset_after=False (model.py:148):
      3*(cin*u + u*u + u) per direction.

Sequence-length tracking uses Keras conv/pool arithmetic: 'valid' ->
(L - ((k-1)*d + 1))//s + 1, 'same' -> ceil(L/s).

Documented divergences from the reference (PARITY.md): for the grouped
models with the full-``x``-per-group slicing bug (model.py:1032,1368)
and the channel-count-argument mismatches (model.py:1306,1382-1386),
the derivations below follow OUR implementation's intended-group
semantics (slice channels to a multiple of g, then real grouped conv);
the reference-actual counts differ and are noted inline.
"""

import math


def conv1d(k, cin, cout, bias=True):
    return k * cin * cout + (cout if bias else 0)


def dw1d(k, cin, bias=False):
    return k * cin + (cin if bias else 0)


def conv2d(kh, kw, cin, cout, bias=True):
    return kh * kw * cin * cout + (cout if bias else 0)


def dense(cin, cout, bias=True):
    return cin * cout + (cout if bias else 0)


def bn(c):
    return 2 * c


def gru(cin, units):
    """Keras 2.1.2 GRU (reset_after=False): kernel [cin,3u], recurrent
    [u,3u], bias [3u]."""
    return 3 * (cin * units + units * units + units)


def bigru(cin, units):
    return 2 * gru(cin, units)


def dcb(k, cin, cout):
    """_depthwise_conv_block (model.py:34-52), use_bias=False throughout:
    depthwise (1,k) + pointwise Conv1D(cout,1) + BN."""
    return dw1d(k, cin) + conv1d(1, cin, cout, bias=False) + bn(cout)


def convbn(k, cin, cout, bias=False):
    """Conv1D(use_bias=False) + BN (+relu6), e.g. model.py:173-185."""
    return conv1d(k, cin, cout, bias) + bn(cout)


def convbn2(kh, kw, cin, cout, bias=True):
    """Conv2D + BN (+act); the 2-D trunks keep Keras's default bias
    (model.py:566-571,617-621)."""
    return conv2d(kh, kw, cin, cout, bias) + bn(cout)


def grouped_convbn(k, cin, cout, g):
    """Grouped plain Conv1D + one BN over the concat (model.py:651-668:
    per-group Conv1D(cout/g, k) + per-group BN(cout/g), which sums to the
    same count)."""
    assert cin % g == 0 and cout % g == 0
    return k * (cin // g) * cout + bn(cout)


def gdb(k, cin, cout, g):
    """Grouped depthwise block, intended semantics (model.py:999-1018
    as our GroupedDepthwiseBlock implements it): depthwise over all cin +
    grouped pointwise + BN.

    Per-group reference math: g * [k*(cin/g) + (cin/g)*(cout/g) +
    2*(cout/g)] — identical total."""
    assert cin % g == 0 and cout % g == 0
    return k * cin + (cin // g) * cout + bn(cout)


def residual1d(k, cin, f, strides=1):
    """_residual_block (model.py:866-878): strided 1x1-BN shortcut when
    strides != 1, two depthwise blocks, pool (param-free), add."""
    shortcut = (conv1d(1, cin, f, bias=False) + bn(f)) if strides != 1 else 0
    return shortcut + dcb(k, cin, f) + dcb(k, f, f)


def out_len(L, k, s=1, padding="valid", d=1):
    if padding == "same":
        return math.ceil(L / s)
    keff = (k - 1) * d + 1
    return (L - keff) // s + 1


def frames_same(n, step):
    """overlapping_time_slice_stack SAME padding (model.py:67-76)."""
    return math.ceil(n / step)


def frames_valid(n, ksize, step):
    return (n - ksize) // step + 1


NUM_CLASSES = 12
MFCC_40 = 98 * 40   # conv_2d*/simple/snn geometry in the tests
MFCC_60 = 98 * 60


def derive_simple():
    """model.py:102-113: Preprocess -> Dense softmax."""
    return dense(MFCC_40, NUM_CLASSES)


def derive_snn():
    """model.py:79-99: SELU MLP 512/256/128/64 + AlphaDropout."""
    total, cin = 0, MFCC_40
    for h in (512, 256, 128, 64):
        total += dense(cin, h)
        cin = h
    return total + dense(cin, NUM_CLASSES)


def derive_conv_1d_simple():
    """model.py:116-156: depthwise stem -> BiGRU(128) -> Dense."""
    total = dcb(31, 1, 32) + dcb(3, 32, 32)
    cin = 32
    for h in (64, 96, 128, 160, 192, 224):
        total += dcb(3, cin, h) + dcb(3, h, h)
        cin = h
    total += bigru(cin, 128)
    return total + dense(2 * 128, NUM_CLASSES)


def derive_inception():
    """model.py:159-254: plain-conv stem + 1-D Inception blocks."""
    def inception(cin, b):
        p = (convbn(1, cin, 2 * b)                                  # 1x1
             + convbn(1, cin, int(1.5 * b)) + convbn(5, int(1.5 * b), 2 * b)
             + convbn(1, cin, 2 * b) + convbn(3, 2 * b, 3 * b)
             + convbn(3, 3 * b, 3 * b)
             + convbn(1, cin, b))                                   # pool br
        return p, 8 * b

    def reduce_inception(cin, b):
        p = (convbn(3, cin, 6 * b)
             + convbn(1, cin, b) + convbn(3, b, int(1.5 * b))
             + convbn(3, int(1.5 * b), int(1.5 * b)))
        return p, 6 * b + int(1.5 * b) + cin  # maxpool passes cin through

    total, cin = 0, 1
    for f, k in [(32, 5), (32, 3), (64, 3), (64, 3), (128, 3), (128, 3),
                 (256, 3), (256, 3), (384, 3), (384, 3), (512, 3), (512, 3)]:
        total += convbn(k, cin, f)
        cin = f
    for kind, b in [("i", 32), ("i", 16), ("r", 32), ("i", 32), ("i", 32),
                    ("r", 64), ("i", 64), ("i", 64), ("r", 96), ("i", 96),
                    ("i", 96)]:
        p, cin = (inception if kind == "i" else reduce_inception)(cin, b)
        total += p
    return total + conv1d(14, cin, NUM_CLASSES)  # head keeps Keras bias


def derive_conv_1d_time_stacked():
    """model.py:257-309: [800,20] conv ladder, Conv1D(nc,5) head."""
    total, cin = convbn(1, 20, 32), 32
    for w in (48, 96, 128, 160, 192, 256):
        total += convbn(3, cin, w) + convbn(3, w, w)
        cin = w
    return total + conv1d(5, cin, NUM_CLASSES)


def derive_inception_d1():
    """model.py:312-406: dilated Inception on [800,20]."""
    def inception(cin, b):
        p = (convbn(1, cin, 2 * b)
             + convbn(1, cin, int(1.5 * b)) + convbn(3, int(1.5 * b), 2 * b)
             + convbn(1, cin, 2 * b) + convbn(3, 2 * b, 3 * b)
             + convbn(3, 3 * b, 3 * b)
             + convbn(1, cin, b))
        return p, 8 * b

    def reduce_inception(cin, b):
        p = (convbn(3, cin, 6 * b)
             + convbn(1, cin, b) + convbn(3, b, int(1.5 * b))
             + convbn(3, int(1.5 * b), int(1.5 * b)))
        return p, 6 * b + int(1.5 * b) + cin

    total, cin = convbn(1, 20, 32), 32
    for f in (64, 128, 256):
        total += convbn(3, cin, f) + convbn(3, f, f)
        cin = f
    for kind in ["i", "i", "r", "i", "i", "r", "i", "i", "r", "i", "i", "r"]:
        p, cin = (inception if kind == "i" else reduce_inception)(cin, 32)
        total += p
    return total + conv1d(6, cin, NUM_CLASSES)


def derive_conv_1d_heavy():
    """model.py:409-467: [1600,10] ladder to 320 + Conv1D(128,5) head."""
    total, cin = convbn(1, 10, 32), 32
    for w in (48, 96, 128, 160, 192, 256, 320):
        total += convbn(3, cin, w) + convbn(3, w, w)
        cin = w
    total += convbn(5, cin, 128)
    return total + conv1d(1, 128, NUM_CLASSES, bias=False)


def derive_conv_1d_gru():
    """model.py:470-512: strided depthwise stem -> Dense 256 head."""
    total, cin = 0, 1
    for f, k in [(128, 63), (256, 31), (384, 15), (448, 7), (512, 5)]:
        total += dcb(k, cin, f)
        cin = f
    total += dcb(8, cin, 512)
    # L: same-padded strides 16,4,4,4,2 -> 1000,250,63,16,8; valid k8 -> 1
    L = 16000
    for s in (16, 4, 4, 4, 2):
        L = out_len(L, 1, s, "same")
    L = out_len(L, 8)
    assert L == 1
    return total + dense(512 * L, 256) + dense(256, NUM_CLASSES)


def derive_conv_2d():
    """model.py:515-544: the TF-tutorial 2-D conv on 98x40 MFCCs."""
    total = conv2d(20, 8, 1, 64) + conv2d(10, 4, 64, 128)
    t, f = 98 // 2, 40 // 2       # MaxPool2D defaults
    t, f = t // 2, f // 2
    return total + dense(t * f * 128, NUM_CLASSES)


def derive_conv_2d_mobile():
    """model.py:547-594: conv-BN-relu6 x8 with stride-2 pairs, GAP."""
    total, cin = 0, 1
    for f in (32, 64, 128, 256):
        total += convbn2(3, 3, cin, f) + convbn2(3, 3, f, f)
        cin = f
    return total + dense(cin, NUM_CLASSES)


def derive_conv_2d_fast():
    """model.py:597-639: dilated conv+pool x4, GAP."""
    total, cin = 0, 1
    for f, (kh, kw) in [(16, (11, 5)), (32, (5, 3)), (64, (3, 3)),
                        (128, (3, 3))]:
        total += convbn2(kh, kw, cin, f)
        cin = f
    return total + dense(cin, NUM_CLASSES)


def derive_conv_1d_fast():
    """model.py:642-713: learned filterbank + grouped convs + Dense."""
    total = conv1d(479, 1, 252, bias=False)
    total += grouped_convbn(15, 252, 300, 6)
    total += grouped_convbn(7, 300, 360, 5)
    L = out_len(16000, 479, 160)
    L = out_len(L, 15, 2)
    L = out_len(L, 7, 2)
    return total + dense(L * 360, NUM_CLASSES)


def _time_sliced_trunk(stem_width, widths, fm=1):
    """Shared conv_1d_time_sliced/_with_attention trunk
    (model.py:716-772,775-838)."""
    total = convbn(3, 40, stem_width * fm)          # framing gives 40 ch
    total += dcb(3, stem_width * fm, widths[0] * fm)
    cin = widths[0] * fm
    for w in widths[1:]:
        total += dcb(3, cin, w * fm) + dcb(3, w * fm, w * fm)
        cin = w * fm
    return total, cin


def derive_conv_1d_time_sliced():
    total, cin = _time_sliced_trunk(32, [64, 128, 192, 256, 320, 384, 512])
    total += dense(cin, 256, bias=False)
    return total + dense(256, NUM_CLASSES, bias=False)


def derive_conv_1d_time_sliced_with_attention():
    """The train.py flagship (model.py:775-838)."""
    total, cin = _time_sliced_trunk(128, [128, 192, 256, 320, 384, 512])
    # length: frames 800 -> stem s2 valid 399 -> ctx 397 -> 5x (same s2,
    # then valid k3): 199,197 / 99,97 / 49,47 / 24,22 / 11,9
    L = frames_same(16000, 20)
    L = out_len(L, 3, 2)
    L = out_len(L, 3)
    for _ in range(5):
        L = out_len(L, 3, 2, "same")
        L = out_len(L, 3)
    assert L == 9
    total += dense(L * cin, 9)                       # attention (bias=True)
    return total + dense(2 * cin, NUM_CLASSES, bias=False)


def derive_conv_1d_residual():
    """model.py:841-908."""
    total = convbn(3, 40, 64)
    total += residual1d(3, 64, 128, 2) + residual1d(3, 128, 256, 2)
    total += 8 * residual1d(3, 256, 256)
    total += residual1d(3, 256, 512, 2) + residual1d(3, 512, 728, 2)
    total += residual1d(3, 728, 728, 2)
    total += dcb(3, 728, 1024) + dcb(3, 1024, 1024)  # _reduce_block
    return total + dense(1024, NUM_CLASSES)


def derive_xception_with_attention():
    """model.py:911-983."""
    total = convbn(3, 40, 64)
    total += residual1d(3, 64, 128, 2) + residual1d(3, 128, 256, 2)
    total += 8 * residual1d(3, 256, 256)
    total += residual1d(3, 256, 384, 2)
    total += dcb(5, 384, 1)                          # attention conv
    total += bigru(384, 192)
    return total + dense(2 * 192, NUM_CLASSES)


def derive_conv_1d_time_sliced_group():
    """model.py:986-1077, intended-group semantics (our implementation
    truncates channels to a multiple of g; the reference's
    _grouped_context_conv convolves the full tensor per group,
    model.py:1032, and its x400 branch slices 32 of 40 channels,
    model.py:1053)."""
    def branch(cin, extra_ctx):
        total = 0
        for w in (64, 128, 160, 192, 224):
            cin -= cin % 4
            total += gdb(3, cin, w, 4)
            total += gdb(3, w, w, 2)
            cin = w
        if extra_ctx:
            total += gdb(3, 224, 224, 2)
        return total

    total = branch(32, True) + branch(40, False)
    # lengths: x500 500-> (valid k3 s2 / k3) x5 -> 12,10 -> extra ctx 8
    # x400 400 -> ... -> 9,7 -> ZeroPadding1D(1,0) -> 8; concat [8,448]
    total += conv1d(8, 448, 128)
    return total + dense(128, NUM_CLASSES)


def derive_conv_1d_multi_time_sliced():
    """model.py:1080-1156."""
    def ladder(cin, widths):
        total = 0
        for w in widths:
            total += dcb(3, cin, w)
            cin = w
        return total

    total = 0
    # xs4 branch [4000, 4]
    total += ladder(4, (16, 32, 48, 64, 96, 128, 160))
    total += dcb(3, 160, 160) + dcb(28, 160, 64)     # ctx + tap a
    total += dcb(3, 160, 192) + dcb(3, 192, 192) + dcb(11, 192, 64)
    # xs5 branch [3200, 5]
    total += ladder(5, (16, 32, 48, 64, 96, 128, 160))
    total += dcb(3, 160, 160) + dcb(22, 160, 64)
    total += dcb(3, 160, 192) + dcb(3, 192, 192) + dcb(8, 192, 64)
    # xs25 branch [640, 25]
    total += ladder(25, (32, 48, 64, 96, 128))
    total += dcb(3, 128, 128) + dcb(17, 128, 64)
    # concat of 5 x 64-channel taps
    total += dcb(1, 5 * 64, 128)
    return total + conv1d(1, 128, NUM_CLASSES)


def derive_conv_1d_learned_spec():
    """model.py:1159-1246, intended-group semantics. The reference's
    second/fourth num_channels args (360/240 at model.py:1230,1234) do
    not match the actual widths; our impl truncates to a multiple of g."""
    total = sum(conv1d(k, 1, 40, bias=False)
                for k in (479, 383, 319, 255, 191, 161))
    cin = 240
    for w in (300, 360, 420, 480):
        total += grouped_convbn(3, cin - cin % 3, w, 3)
        total += grouped_convbn(3, w - w % 2, w, 2)
        cin = w
    L = frames_same(16000, 160)                      # SAME stride-160 stems
    for _ in range(4):
        L = out_len(L, 3, 2)
        L = out_len(L, 3)
    return total + dense(L * 480, NUM_CLASSES)


def derive_conv_1d_spec():
    """model.py:1249-1323, grouped plain convs on [98, 257]. The first
    4-way group slices to 252 channels (explicit num_channels=252,
    model.py:1306)."""
    total = 0
    cin = 252
    for w in (300, 360, 420, 480):
        total += grouped_convbn(3, cin - cin % 4, w, 4)
        total += grouped_convbn(3, w - w % 3, w, 3)
        cin = w
    L = 98
    for _ in range(4):
        L = out_len(L, 3, 2)
        L = out_len(L, 3)
    return total + dense(L * 480, NUM_CLASSES)


def derive_conv_1d_top_down():
    """model.py:1326-1397, intended-group semantics (the reference's
    _grouped_context_conv full-x bug model.py:1368 and num_channels
    mismatches model.py:1382-1386 are resolved to real grouped convs)."""
    total = conv1d(479, 1, 480)                      # stem keeps Keras bias
    cin = 480
    for w in (420, 360, 300, 240):
        total += gdb(3, cin - cin % 3, w, 3)
        total += gdb(3, w - w % 2, w, 2)
        cin = w
    L = out_len(16000, 479, 160)
    for _ in range(4):
        L = out_len(L, 3, 2)
        L = out_len(L, 3)
    return total + dense(L * 240, NUM_CLASSES)


def _residual_feature_trunk(freq):
    """Shared trunk of conv_1d_log_mfcc / conv_1d_spectrogram
    (model.py:1400-1561)."""
    total = convbn(3, freq, 64)
    cin = 64
    for f, s in [(64, 1), (64, 1), (128, 2), (128, 1), (192, 2), (192, 1),
                 (192, 1), (256, 2), (256, 1), (256, 1)]:
        total += residual1d(3, cin, f, s)
        cin = f
    total += dcb(3, cin, 1)                          # attention conv
    return total + dense(cin, NUM_CLASSES)


def derive_conv_1d_log_mfcc():
    return _residual_feature_trunk(60)


def derive_conv_1d_spectrogram():
    return _residual_feature_trunk(257)


def derive_conv_1d_mfcc_and_raw():
    """model.py:1564-1660: two-branch fusion."""
    total = convbn(3, 60, 64)                        # mfcc branch stem
    total += convbn(3, 480, 96)                      # raw branch stem
    cin = 64 + 96
    for f, s in [(160, 1), (160, 1), (192, 2), (192, 1), (256, 2), (256, 1),
                 (320, 2), (320, 1), (384, 2), (384, 1)]:
        total += residual1d(3, cin, f, s)
        cin = f
    return total + dense(cin, NUM_CLASSES)


def derive_steffeNet():
    """model.py:1663-1726: wide conv stem + strided residual pairs."""
    total = convbn(75, 1, 256) + dcb(3, 256, 256)
    cin = 256
    for nh in (320, 384, 512, 768, 1024, 1536):
        total += residual1d(3, cin, nh, 2)           # strided pair member
        total += residual1d(3, nh, nh, 1)
        cin = nh
    return total + dense(2 * cin, NUM_CLASSES, bias=False)


DERIVED_PARAM_COUNTS = {
    "simple": derive_simple(),
    "snn": derive_snn(),
    "conv_1d_simple": derive_conv_1d_simple(),
    "inception": derive_inception(),
    "conv_1d_time_stacked": derive_conv_1d_time_stacked(),
    "inception_d1": derive_inception_d1(),
    "conv_1d_heavy": derive_conv_1d_heavy(),
    "conv_1d_gru": derive_conv_1d_gru(),
    "conv_2d": derive_conv_2d(),
    "conv_2d_mobile": derive_conv_2d_mobile(),
    "conv_2d_fast": derive_conv_2d_fast(),
    "conv_1d_fast": derive_conv_1d_fast(),
    "conv_1d_time_sliced": derive_conv_1d_time_sliced(),
    "conv_1d_time_sliced_with_attention":
        derive_conv_1d_time_sliced_with_attention(),
    "conv_1d_residual": derive_conv_1d_residual(),
    "xception_with_attention": derive_xception_with_attention(),
    "conv_1d_time_sliced_group": derive_conv_1d_time_sliced_group(),
    "conv_1d_multi_time_sliced": derive_conv_1d_multi_time_sliced(),
    "conv_1d_learned_spec": derive_conv_1d_learned_spec(),
    "conv_1d_spec": derive_conv_1d_spec(),
    "conv_1d_top_down": derive_conv_1d_top_down(),
    "conv_1d_log_mfcc": derive_conv_1d_log_mfcc(),
    "conv_1d_spectrogram": derive_conv_1d_spectrogram(),
    "conv_1d_mfcc_and_raw": derive_conv_1d_mfcc_and_raw(),
    "steffeNet": derive_steffeNet(),
}
