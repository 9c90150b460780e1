from pynama_tpu.cases.problem import Problem
