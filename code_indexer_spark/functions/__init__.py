# functions: reusable JVM-side Column expression helpers
