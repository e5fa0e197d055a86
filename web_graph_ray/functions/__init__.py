"""web_graph_ray.functions"""
