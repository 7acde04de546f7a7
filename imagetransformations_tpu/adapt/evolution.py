"""Evolutionary transform search — population on host, fitness on device.

Parity with pipenline/cifar_image_transformations.py:
- Individual genome = list of (op_name, params) (:132-147)
- mutate / crossover (:149-175)
- fitness = 1/(1+uncertainty); uncertainty = 1.0 if MSP < threshold else
  1 - MSP (:177-201)
- evolutionary_search (:232-289): population 15-20, 3-5 generations,
  elitism + crossover + random immigrants.

TPU-first: each individual's transform chain is applied to the WHOLE batch
in one compiled call (pipeline.chain); chains reuse compiled executables
across generations because params are traced vectors / static grid values.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from imagetransformations_tpu.pipeline.chain import OpSpec, build_chain_fn

#: gene pool mirrors TransformationPool (cifar_image_transformations.py:37-129)
GENE_POOL: dict[str, Sequence] = {
    "gaussian_noise": [0.02, 0.04, 0.08],
    "impulse_noise": [0.03, 0.09, 0.17],
    "blur": [0.5, 1.0, 1.5],
    "sharpness": [1.2, 1.5, 2.0],
    "enhance_contrast": [0.8, 1.0, 1.2],
    "brightness": [-0.1, 0.0, 0.1],
    "enhance_color": [0.8, 1.0, 1.2],
    "histogram_equalization": [None],
}

_PARAM_KEY = {
    "gaussian_noise": "std",
    "impulse_noise": "amount",
    "blur": "radius",
    "sharpness": "factor",
    "enhance_contrast": "factor",
    "brightness": "factor",
    "enhance_color": "factor",
}


@dataclasses.dataclass
class Individual:
    genome: list[tuple[str, object]]
    fitness: float = 0.0

    def to_chain(self) -> list[OpSpec]:
        chain = []
        for op, val in self.genome:
            pk = _PARAM_KEY.get(op)
            chain.append(OpSpec(op, {} if pk is None else {pk: val}))
        return chain


def random_individual(rng: random.Random, length: int = 2) -> Individual:
    genome = []
    for _ in range(length):
        op = rng.choice(list(GENE_POOL))
        genome.append((op, rng.choice(list(GENE_POOL[op]))))
    return Individual(genome)


def mutate(ind: Individual, rng: random.Random, rate: float = 0.3) -> Individual:
    genome = list(ind.genome)
    for i, (op, val) in enumerate(genome):
        if rng.random() < rate:
            if rng.random() < 0.5:
                genome[i] = (op, rng.choice(list(GENE_POOL[op])))
            else:
                new_op = rng.choice(list(GENE_POOL))
                genome[i] = (new_op, rng.choice(list(GENE_POOL[new_op])))
    return Individual(genome)


def crossover(a: Individual, b: Individual, rng: random.Random) -> Individual:
    cut = rng.randint(0, min(len(a.genome), len(b.genome)))
    return Individual(a.genome[:cut] + b.genome[cut:])


from imagetransformations_tpu.core.jitutil import IdLRUCache

#: fused chain+forward+uncertainty executables per (model, preprocess,
#: genome, threshold) — fallback for genome lengths the universal
#: executable doesn't cover. Elites and duplicate genomes recur every
#: generation; without this each fitness call re-jitted the whole chain.
_FITNESS_CACHE = IdLRUCache(maxsize=128)

#: ONE executable for EVERY genome (per model/preprocess/threshold/
#: genome-length): lax.switch over the (op, value) gene combos applied
#: per genome slot, with the combo indices as RUNTIME operands. The
#: per-genome cache above compiled a fresh chain per distinct genome —
#: measured 358.9 s cold for 33 distinct genomes in the pop-15 x 3-gen
#: reference search on v5e (tools/probe_evolution.py, round 5); one
#: switch executable compiles every branch once instead.
_UNIVERSAL_CACHE = IdLRUCache(maxsize=8)

#: the gene combos in GENE_POOL iteration order — the universal
#: executable's branch table (index = combo id)
_GENE_COMBOS: list[tuple[str, object]] = [
    (op, val) for op, vals in GENE_POOL.items() for val in vals
]
_COMBO_INDEX = {c: i for i, c in enumerate(_GENE_COMBOS)}


def _universal_fitness_fn(model_fn, to_model_space, msp_threshold, length):
    fn = _UNIVERSAL_CACHE.get(
        (model_fn, to_model_space), (float(msp_threshold), int(length))
    )
    if fn is not None:
        return fn
    branches = []
    for op, val in _GENE_COMBOS:
        pk = _PARAM_KEY.get(op)
        spec = OpSpec(op, {} if pk is None else {pk: val})
        branches.append(build_chain_fn([spec], jit=False))

    @jax.jit
    def fn(x, k, idx):
        ks = jax.random.split(k, length)
        for s in range(length):
            x = jax.lax.switch(
                idx[s], [lambda xx, br=br, kk=ks[s]: br(xx, kk) for br in branches], x
            )
        logits = model_fn(to_model_space(x))
        msp = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
        unc = jnp.where(msp < msp_threshold, 1.0, 1.0 - msp)
        return 1.0 / (1.0 + jnp.mean(unc))

    _UNIVERSAL_CACHE.put(
        (model_fn, to_model_space), (float(msp_threshold), int(length)), fn
    )
    return fn


def fitness_fn(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    to_model_space: Callable[[jnp.ndarray], jnp.ndarray],
    images_u8: jnp.ndarray,
    individual: Individual,
    key: jax.Array,
    msp_threshold: float = 0.8,
) -> float:
    """fitness = 1 / (1 + mean uncertainty); uncertainty = 1 if MSP < thr
    else 1 - MSP (cifar_image_transformations.py:177-201). Chain, forward
    and the uncertainty reduction run as ONE jitted dispatch; genomes
    drawn from GENE_POOL share ONE switch-based executable (combo ids as
    runtime operands), so a whole search pays one compile."""
    genome_key = tuple(individual.genome)
    if all(g in _COMBO_INDEX for g in individual.genome):
        fn = _universal_fitness_fn(
            model_fn, to_model_space, msp_threshold, len(individual.genome)
        )
        idx = jnp.asarray([_COMBO_INDEX[g] for g in individual.genome], jnp.int32)
        return float(fn(images_u8, key, idx))
    fn = _FITNESS_CACHE.get(
        (model_fn, to_model_space), (genome_key, float(msp_threshold))
    )
    if fn is None:
        chain = individual.to_chain()

        @jax.jit
        def fn(x, k):
            transformed = build_chain_fn(chain, jit=False)(x, k)
            logits = model_fn(to_model_space(transformed))
            msp = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
            unc = jnp.where(msp < msp_threshold, 1.0, 1.0 - msp)
            return 1.0 / (1.0 + jnp.mean(unc))

        _FITNESS_CACHE.put(
            (model_fn, to_model_space), (genome_key, float(msp_threshold)), fn
        )
    return float(fn(images_u8, key))


def evolutionary_search(
    model_fn,
    to_model_space,
    images_u8: jnp.ndarray,
    population_size: int = 16,
    generations: int = 4,
    elite: int = 4,
    seed: int = 0,
) -> Individual:
    """Find the transform chain that maximizes model confidence on the batch."""
    rng = random.Random(seed)
    key = jax.random.key(seed)
    pop = [random_individual(rng) for _ in range(population_size)]
    for gen in range(generations):
        for ind in pop:
            key, k = jax.random.split(key)
            ind.fitness = fitness_fn(model_fn, to_model_space, images_u8, ind, k)
        pop.sort(key=lambda i: -i.fitness)
        nxt = pop[:elite]
        while len(nxt) < population_size - 2:
            a, b = rng.sample(pop[: max(elite * 2, 4)], 2)
            nxt.append(mutate(crossover(a, b, rng), rng))
        nxt += [random_individual(rng) for _ in range(population_size - len(nxt))]
        pop = nxt
    for ind in pop:
        key, k = jax.random.split(key)
        ind.fitness = fitness_fn(model_fn, to_model_space, images_u8, ind, k)
    return max(pop, key=lambda i: i.fitness)
