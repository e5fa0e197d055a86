"""web_graph_ray.pipelines"""
