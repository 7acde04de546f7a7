from imagetransformations_tpu.attacks.fgsm import (  # noqa: F401
    adversarial_train_step,
    fgsm_attack,
    minimal_epsilon,
    reverse_fgsm,
)
from imagetransformations_tpu.attacks.pgd import pgd_attack  # noqa: F401
