"""parse_hlo_bytes: per-op HBM byte estimates from optimized HLO text.

The roofline in utils/profile_step.py needs bytes-moved per op; the axon
trace may not export byte counters, so bytes are estimated from the
compiled module's instruction shapes (operands read once + output written
once). These tests pin the parser against hand-written HLO lines and a
real compiled module on the CPU backend.
"""
import jax
import jax.numpy as jnp

from utils.profile_step import _shape_bytes, parse_hlo_bytes


def test_shape_bytes_scalar_and_tuple():
    assert _shape_bytes("f32[8,28,28,64]{3,2,1,0}") == 8 * 28 * 28 * 64 * 4
    assert _shape_bytes("bf16[2,3]") == 12
    assert _shape_bytes("f32[]") == 4
    assert _shape_bytes("(f32[2]{0}, bf16[4]{0})") == 8 + 8
    assert _shape_bytes("token[]") == 0
    assert _shape_bytes("pred[7]") == 7
    # nested tuple
    assert _shape_bytes("(f32[2]{0}, (s32[3]{0}, u8[5]{0}))") == 8 + 12 + 5


def test_parse_handwritten_module():
    txt = """
HloModule jit_f

%fused_computation (p0: f32[4,4]) -> f32[4,4] {
  %p0 = f32[4,4]{1,0} parameter(0)
  ROOT %m = f32[4,4]{1,0} multiply(%p0, %p0)
}

ENTRY %main (x: f32[4,4], w: f32[4,2]) -> f32[4,2] {
  %x = f32[4,4]{1,0} parameter(0)
  %w = f32[4,2]{1,0} parameter(1)
  %sq = f32[4,4]{1,0} fusion(%x), kind=kLoop, calls=%fused_computation
  ROOT %dot.1 = f32[4,2]{1,0} dot(%sq, %w), lhs_contracting_dims={1}, rhs_contracting_dims={0}
}
"""
    b = parse_hlo_bytes(txt)
    # fusion: reads x (64B), writes 64B -> total 128; calls=%... must NOT
    # count as a data operand.
    assert b["sq"] == (64, 128)
    # dot: reads sq (64) + w (32), writes 32
    assert b["dot.1"] == (32, 128)
    assert b["x"] == (64, 64)


def test_parse_real_compiled_module():
    def f(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y, 0.0).sum()

    x = jnp.ones((8, 28, 28, 32), jnp.float32)
    w = jnp.ones((3, 3, 32, 64), jnp.float32)
    txt = jax.jit(f).lower(x, w).compile().as_text()
    b = parse_hlo_bytes(txt)
    assert b, "no instructions parsed"
    conv = [n for n in b if "conv" in n]
    assert conv, f"no conv instruction found in {list(b)[:10]}"
    out_b, tot_b = b[conv[0]]
    x_b = 8 * 28 * 28 * 32 * 4
    w_b = 3 * 3 * 32 * 64 * 4
    y_b = 8 * 28 * 28 * 64 * 4
    assert out_b == y_b
    assert tot_b == y_b + x_b + w_b
