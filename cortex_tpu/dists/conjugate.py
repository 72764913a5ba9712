"""Conjugate exponential families: Beta, Gamma, Bernoulli, Categorical, Dirichlet.

Batched JAX pytrees with the closed-form product algebra the reference's test
distributions implement (``/root/reference/test/runtests.jl:17-101``):

- Beta product: ``Beta(a1+a2−1, b1+b2−1)``,
- Gamma product: ``Gamma(α1+α2−1, rate1+rate2)`` (the reference stores scales,
  ``test/runtests.jl:86-88`` — identical algebra in rate form),
- Categorical/Bernoulli product: add log-probabilities,
- Dirichlet product: ``Dir(α1+α2−1)``.

All leading dimensions are batch dimensions; everything is jittable/vmappable.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, digamma, gammaln

__all__ = ["Beta", "Gamma", "Bernoulli", "Categorical", "Dirichlet"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Beta:
    """Beta(a, b) with shape parameters stored directly."""

    a: jax.Array
    b: jax.Array

    @property
    def mean(self) -> jax.Array:
        return self.a / (self.a + self.b)

    @property
    def variance(self) -> jax.Array:
        s = self.a + self.b
        return self.a * self.b / (s * s * (s + 1.0))

    def __mul__(self, other: "Beta") -> "Beta":
        return Beta(self.a + other.a - 1.0, self.b + other.b - 1.0)

    @classmethod
    def reduce_product(cls, stacked: "Beta", axis: int = 0) -> "Beta":
        """Product of k stacked Betas in ONE reduction (see
        :func:`cortex_tpu.compile.product_reduce`): pairwise ``*`` is
        associative with the affine correction −(k−1) on both shapes."""
        k = jnp.shape(stacked.a)[axis]
        return cls(
            jnp.sum(stacked.a, axis) - (k - 1.0),
            jnp.sum(stacked.b, axis) - (k - 1.0),
        )

    def __truediv__(self, other: "Beta") -> "Beta":
        return Beta(self.a - other.a + 1.0, self.b - other.b + 1.0)

    def log_normalizer(self) -> jax.Array:
        return betaln(self.a, self.b)

    def logpdf(self, x: jax.Array) -> jax.Array:
        return (
            (self.a - 1.0) * jnp.log(x)
            + (self.b - 1.0) * jnp.log1p(-x)
            - betaln(self.a, self.b)
        )

    def entropy(self) -> jax.Array:
        a, b = self.a, self.b
        return (
            betaln(a, b)
            - (a - 1.0) * digamma(a)
            - (b - 1.0) * digamma(b)
            + (a + b - 2.0) * digamma(a + b)
        )

    def kl(self, other: "Beta") -> jax.Array:
        """KL(self ‖ other)."""
        a1, b1, a2, b2 = self.a, self.b, other.a, other.b
        return (
            betaln(a2, b2)
            - betaln(a1, b1)
            + (a1 - a2) * digamma(a1)
            + (b1 - b2) * digamma(b1)
            + (a2 - a1 + b2 - b1) * digamma(a1 + b1)
        )

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = ()) -> jax.Array:
        return jax.random.beta(key, self.a, self.b, shape + jnp.shape(self.a))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Gamma:
    """Gamma(shape α, rate β).  ``mean = α/β``.

    The reference stores (shape, scale) (``test/runtests.jl:61-67``); rate form
    makes the product a pure addition, which batches better.
    """

    shape: jax.Array
    rate: jax.Array

    @classmethod
    def from_shape_scale(cls, shape, scale) -> "Gamma":
        shape = jnp.asarray(shape)
        scale = jnp.asarray(scale)
        return cls(shape, 1.0 / scale)

    @property
    def scale(self) -> jax.Array:
        return 1.0 / self.rate

    @property
    def mean(self) -> jax.Array:
        return self.shape / self.rate

    @property
    def variance(self) -> jax.Array:
        return self.shape / (self.rate * self.rate)

    def mean_log(self) -> jax.Array:
        """E[log x] = ψ(α) − log β (used by VMP precision updates)."""
        return digamma(self.shape) - jnp.log(self.rate)

    def __mul__(self, other: "Gamma") -> "Gamma":
        return Gamma(self.shape + other.shape - 1.0, self.rate + other.rate)

    @classmethod
    def reduce_product(cls, stacked: "Gamma", axis: int = 0) -> "Gamma":
        """Product of k stacked Gammas in ONE reduction
        (Σα − (k−1), Σβ) — the batched form of the pairwise ``*``."""
        k = jnp.shape(stacked.shape)[axis]
        return cls(
            jnp.sum(stacked.shape, axis) - (k - 1.0),
            jnp.sum(stacked.rate, axis),
        )

    def __truediv__(self, other: "Gamma") -> "Gamma":
        return Gamma(self.shape - other.shape + 1.0, self.rate - other.rate)

    def log_normalizer(self) -> jax.Array:
        return gammaln(self.shape) - self.shape * jnp.log(self.rate)

    def logpdf(self, x: jax.Array) -> jax.Array:
        return (
            self.shape * jnp.log(self.rate)
            - gammaln(self.shape)
            + (self.shape - 1.0) * jnp.log(x)
            - self.rate * x
        )

    def entropy(self) -> jax.Array:
        a = self.shape
        return a - jnp.log(self.rate) + gammaln(a) + (1.0 - a) * digamma(a)

    def kl(self, other: "Gamma") -> jax.Array:
        """KL(self ‖ other)."""
        a1, b1, a2, b2 = self.shape, self.rate, other.shape, other.rate
        return (
            (a1 - a2) * digamma(a1)
            - gammaln(a1)
            + gammaln(a2)
            + a2 * (jnp.log(b1) - jnp.log(b2))
            + a1 * (b2 - b1) / b1
        )

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = ()) -> jax.Array:
        return (
            jax.random.gamma(key, self.shape, shape + jnp.shape(self.shape))
            / self.rate
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Bernoulli:
    """Bernoulli in log-odds (natural) form: ``logit = log(p/(1−p))``."""

    logit: jax.Array

    @classmethod
    def from_prob(cls, p) -> "Bernoulli":
        p = jnp.asarray(p)
        return cls(jnp.log(p) - jnp.log1p(-p))

    @property
    def prob(self) -> jax.Array:
        return jax.nn.sigmoid(self.logit)

    @property
    def mean(self) -> jax.Array:
        return self.prob

    @property
    def variance(self) -> jax.Array:
        p = self.prob
        return p * (1.0 - p)

    def __mul__(self, other: "Bernoulli") -> "Bernoulli":
        return Bernoulli(self.logit + other.logit)

    @classmethod
    def reduce_product(cls, stacked: "Bernoulli", axis: int = 0) -> "Bernoulli":
        """Product of k stacked Bernoullis in ONE reduction (Σ logit)."""
        return cls(jnp.sum(stacked.logit, axis))

    def __truediv__(self, other: "Bernoulli") -> "Bernoulli":
        return Bernoulli(self.logit - other.logit)

    def log_normalizer(self) -> jax.Array:
        return jax.nn.softplus(self.logit)

    def entropy(self) -> jax.Array:
        p = self.prob
        return -(p * jnp.log(p) + (1.0 - p) * jnp.log1p(-p))

    def kl(self, other: "Bernoulli") -> jax.Array:
        """KL(self ‖ other) via the softplus log-normalizers."""
        p = self.prob
        return (
            p * (self.logit - other.logit)
            - jax.nn.softplus(self.logit)
            + jax.nn.softplus(other.logit)
        )

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = ()) -> jax.Array:
        return jax.random.bernoulli(key, self.prob, shape + jnp.shape(self.logit))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Categorical:
    """Categorical over K classes in unnormalized log-probability form.

    ``logits``: ``(..., K)``.  Messages multiply by adding logits; the
    normalizer is tracked implicitly (``log_normalizer`` = logsumexp).
    """

    logits: jax.Array

    @classmethod
    def from_probs(cls, p) -> "Categorical":
        return cls(jnp.log(jnp.asarray(p)))

    @property
    def probs(self) -> jax.Array:
        return jax.nn.softmax(self.logits, axis=-1)

    @property
    def mean(self) -> jax.Array:
        return self.probs

    def __mul__(self, other: "Categorical") -> "Categorical":
        return Categorical(self.logits + other.logits)

    @classmethod
    def reduce_product(
        cls, stacked: "Categorical", axis: int = 0
    ) -> "Categorical":
        """Product of k stacked Categoricals in ONE reduction
        (Σ logits)."""
        return cls(jnp.sum(stacked.logits, axis))

    def __truediv__(self, other: "Categorical") -> "Categorical":
        return Categorical(self.logits - other.logits)

    def log_normalizer(self) -> jax.Array:
        return jax.nn.logsumexp(self.logits, axis=-1)

    def entropy(self) -> jax.Array:
        p = self.probs
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return -jnp.sum(p * logp, axis=-1)

    def kl(self, other: "Categorical") -> jax.Array:
        p = self.probs
        return jnp.sum(
            p
            * (
                jax.nn.log_softmax(self.logits, axis=-1)
                - jax.nn.log_softmax(other.logits, axis=-1)
            ),
            axis=-1,
        )

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = ()) -> jax.Array:
        return jax.random.categorical(
            key, self.logits, shape=shape + jnp.shape(self.logits)[:-1]
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Dirichlet:
    """Dirichlet(α) over the simplex, ``alpha``: ``(..., K)``."""

    alpha: jax.Array

    @property
    def mean(self) -> jax.Array:
        return self.alpha / jnp.sum(self.alpha, axis=-1, keepdims=True)

    def mean_log(self) -> jax.Array:
        """E[log x_k] = ψ(α_k) − ψ(Σα) (drives Categorical VMP messages)."""
        return digamma(self.alpha) - digamma(
            jnp.sum(self.alpha, axis=-1, keepdims=True)
        )

    def __mul__(self, other: "Dirichlet") -> "Dirichlet":
        return Dirichlet(self.alpha + other.alpha - 1.0)

    @classmethod
    def reduce_product(cls, stacked: "Dirichlet", axis: int = 0) -> "Dirichlet":
        """Product of k stacked Dirichlets in ONE reduction
        (Σα − (k−1))."""
        k = jnp.shape(stacked.alpha)[axis]
        return cls(jnp.sum(stacked.alpha, axis) - (k - 1.0))

    def __truediv__(self, other: "Dirichlet") -> "Dirichlet":
        return Dirichlet(self.alpha - other.alpha + 1.0)

    def log_normalizer(self) -> jax.Array:
        return jnp.sum(gammaln(self.alpha), axis=-1) - gammaln(
            jnp.sum(self.alpha, axis=-1)
        )

    def entropy(self) -> jax.Array:
        a = self.alpha
        a0 = jnp.sum(a, axis=-1)
        k = a.shape[-1]
        return (
            self.log_normalizer()
            + (a0 - k) * digamma(a0)
            - jnp.sum((a - 1.0) * digamma(a), axis=-1)
        )

    def kl(self, other: "Dirichlet") -> jax.Array:
        a1, a2 = self.alpha, other.alpha
        s1 = jnp.sum(a1, axis=-1)
        return (
            gammaln(s1)
            - jnp.sum(gammaln(a1), axis=-1)
            - gammaln(jnp.sum(a2, axis=-1))
            + jnp.sum(gammaln(a2), axis=-1)
            + jnp.sum((a1 - a2) * (digamma(a1) - digamma(s1)[..., None]), axis=-1)
        )

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = ()) -> jax.Array:
        return jax.random.dirichlet(key, self.alpha, shape + jnp.shape(self.alpha)[:-1])
